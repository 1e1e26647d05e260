"""Cross-engine oracle check on a hostile-UNICODE corpus.

The driver fixtures are pure ASCII, so the sf-sweeps can never catch a
divergence that only multibyte text (or its side effects — empty
tokens from repeated spaces, codepoint-vs-byte lengths, collation)
triggers. This tool synthesizes a unicode `documents` table beside the
sf0.001 relational tables and runs the text/dedup/pipeline oracle
subset through tools/check_oracle.py.

Round-13 proof of value: first run flagged `text_bpe_train_merges` —
Spark's sequence(1, 0) minted ['',''] symbols for empty tokens and a
bogus ('','') merge outvoted the real pairs (fixed in the same round).

Usage: python tools/unicode_oracle.py
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC_SF = "/root/testdata/sf0.001"

TEXTS = [
    "héllo wörld héllo wörld naïve café",
    "héllo wörld héllo wörld naïve cafe",
    "日本語の テキスト には スペース",
    "מימין לשמאל עברית וגם مِن اليمين العربية",
    "emoji 🚀🔥 and 👩‍👩‍👧‍👧 family plus é combining",
    "double  space   runs keep  empty tokens",
    "der schnelle braune fuchs springt über den zaun",
    "ça va très bien merci beaucoup à bientôt",
    "χαίρετε κόσμε αυτό είναι ελληνικό κείμενο",
    "привет мир это русский текст для теста",
]

# entries whose plans touch documents.text — the surface unicode can
# break; relational/event entries are byte-free and skipped.
# dedup_edit_distance_* are EXCLUDED by a documented ORACLE-function
# limitation, not an engine bug: DuckDB's levenshtein() counts BYTES
# while Spark's counts CODEPOINTS ("héllo wörld"→"hello world" is 4
# vs 2), so the twins only agree on ASCII — the driver fixtures.
# Spark's codepoint semantics (the correct ones for text) are pinned
# by the unicode parity pytest in tests/test_unicode_text.py.
FILTERS = [
    "text_", "dedup_", "!dedup_edit_distance",
    "pipeline_learnability_select",
    "pipeline_context_chunks", "ml_eval_auc_nb", "ml_eval_ece",
    "ml_eval_avg_precision_nb", "ml_eval_mrr_bm25", "ml_eval_ndcg_bm25",
    "ml_eval_pr_curve", "text_unigram", "pipeline_doremi_weights",
]


def build_corpus(d: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    for t in ("region nation customer supplier part orders lineitem "
              "events embeddings").split():
        shutil.copy(os.path.join(SRC_SF, f"{t}.parquet"), d)
    docs = []
    for i in range(60):
        t = TEXTS[i % len(TEXTS)] + (f" doc{i}" if i % 3 == 0 else "")
        docs.append((i, t, "xx", f"src{i % 4}", len(t)))
    pq.write_table(
        pa.table({
            "doc_id": pa.array([x[0] for x in docs], pa.int64()),
            "text": pa.array([x[1] for x in docs], pa.string()),
            "lang": pa.array([x[2] for x in docs], pa.string()),
            "source": pa.array([x[3] for x in docs], pa.string()),
            "n_chars": pa.array([x[4] for x in docs], pa.int64()),
        }),
        os.path.join(d, "documents.parquet"),
    )


def main() -> None:
    d = tempfile.mkdtemp(prefix="unicorpus_")
    try:
        build_corpus(d)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"),
             d, *FILTERS],
            cwd=REPO,
        )
        sys.exit(proc.returncode)
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
