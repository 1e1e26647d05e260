"""Unicode robustness of the text/dedup operator layer.

The driver fixtures are pure-ASCII, and several ORACLES exploit that
(ascii(substr(..)) byte twins are documented as ASCII-only). The
ENGINE, however, must be correct on real-world text — multibyte UTF-8,
combining marks, emoji, CJK (no spaces), RTL scripts. These tests run
the Spark operators on a deliberately hostile unicode corpus and
compare against independent pure-Python references, pinning that:

- tokenization is exact split-on-single-space over CODEPOINTS (not
  bytes), empty tokens preserved (the r6 ADVICE contract);
- shingle hashing (md5-h60) hashes UTF-8 bytes of the codepoint
  string — stable across engines and platforms;
- quality/stat operators count codepoints, not bytes;
- SimHash fingerprints and exact dedup digests are byte-exact on
  multibyte payloads (near-dup semantics survive non-ASCII);
- the BMP codec boundary correctly REFUSES multibyte text payloads
  rather than mis-decoding them.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

UNICODE_DOCS = [
    # (doc_id, text) — spaces only where a real U+0020 appears
    (1, "héllo wörld héllo wörld naïve café"),
    (2, "héllo wörld héllo wörld naïve cafe"),  # 1-token edit of doc 1
    (3, "日本語のテキストにはスペースがない"),  # CJK, zero spaces
    (4, "מימין לשמאל עברית וגם مِن اليمين العربية"),  # RTL + combining
    (5, "emoji 🚀🔥 and 👩‍👩‍👧‍👧 family plus é combining"),
    (6, "double  space   runs keep  empty tokens"),
    (7, "ascii control tab\there newline stays one doc"),
    (8, ""),  # empty text
]


@pytest.fixture(scope="module")
def udocs(spark):
    return spark.createDataFrame(UNICODE_DOCS, "doc_id long, text string")


def _py_tokens(t: str) -> list[str]:
    return t.split(" ")  # exact engine semantics: single space, keep empties


def test_tokenizer_is_codepoint_exact_on_unicode(udocs):
    from bigquery_postgres_events_etl_spark.operators.dedup import with_tokens

    got = {r.doc_id: list(r.tokens) for r in with_tokens(udocs).collect()}
    for did, text in UNICODE_DOCS:
        assert got[did] == _py_tokens(text), did


def test_shingle_hashes_are_md5_of_utf8_on_unicode(udocs):
    """md5_hash60 must hash the UTF-8 bytes of the shingle STRING —
    pinned against hashlib on the pure-Python shingles."""
    from bigquery_postgres_events_etl_spark.operators.dedup import (
        distinct_hashed_shingles,
    )

    got: dict[int, set] = {}
    for r in distinct_hashed_shingles(udocs, 3).collect():
        got.setdefault(r.doc_id, set()).add(r.h)

    for did, text in UNICODE_DOCS:
        toks = _py_tokens(text)
        ref = {
            int(
                hashlib.md5(
                    " ".join(toks[i : i + 3]).encode("utf-8")
                ).hexdigest()[:15],
                16,
            )
            for i in range(len(toks) - 2)
        }
        if ref:
            assert got.get(did) == ref, did
        else:
            assert did not in got, did  # <3 tokens -> no shingles


def test_text_stats_count_codepoints_not_bytes(udocs):
    """n_chars must be len() in codepoints — a byte-based engine would
    report ~3x for CJK and blow up on the ZWJ emoji sequence."""
    from bigquery_postgres_events_etl_spark.operators.text import text_stats

    got = {r.doc_id: r for r in text_stats(udocs).collect()}
    for did, text in UNICODE_DOCS:
        assert got[did].n_chars == len(text), did
        assert got[did].n_tokens == len(_py_tokens(text)), did


def test_exact_dedup_digest_is_utf8_md5_on_unicode(udocs):
    from bigquery_postgres_events_etl_spark.operators.dedup import exact_dedup

    got = {r.text_hash: r.n_copies for r in exact_dedup(udocs).collect()}
    for _, text in UNICODE_DOCS:
        assert hashlib.md5(text.encode("utf-8")).hexdigest() in got


def test_simhash_locality_survives_multibyte(udocs):
    """Byte-identical multibyte docs collide exactly; the 1-token edit
    (doc 2 vs doc 1: café→cafe) stays within a small Hamming radius;
    the CJK doc lands far from the Latin ones."""
    from bigquery_postgres_events_etl_spark.operators.dedup import simhash

    sig = {r.doc_id: r.simhash for r in simhash(udocs).collect()}

    def ham(a, b):
        return bin((sig[a] ^ sig[b]) & ((1 << 64) - 1)).count("1")

    assert ham(1, 2) <= 16, f"one-token edit moved simhash too far: {ham(1, 2)}"
    assert ham(1, 3) > 16, f"unrelated CJK too close to Latin: {ham(1, 3)}"


def test_bmp_codec_refuses_multibyte_payloads():
    """Multibyte payloads must raise, never mis-decode: the strict
    header validation is what licenses the ASCII-only oracle twins."""
    from bigquery_postgres_events_etl_spark.operators.bmpcodec import decode_bmp

    for _, text in UNICODE_DOCS:
        with pytest.raises(ValueError):
            decode_bmp(text.encode("utf-8"))


def test_lang_id_on_real_unicode(udocs):
    """The n-gram language heuristic must at least run cleanly on and
    assign SOME label to every non-empty unicode doc (no crashes on
    CJK/RTL/emoji), and be deterministic across two invocations."""
    from bigquery_postgres_events_etl_spark.operators.text import language_id

    a = {r.doc_id: r for r in language_id(udocs).collect()}
    b = {r.doc_id: r for r in language_id(udocs).collect()}
    assert set(a) == {d for d, _ in UNICODE_DOCS}
    for did in a:
        assert a[did] == b[did], did


def test_text_stats_unicode_pinned_against_hashlib(spark, sf_dir):
    """Third opinion for the r9 driver-hash entry: the registered
    query's per-doc stats must equal a pure-Python recomputation
    (str.split, len, UTF-8 byte length, hashlib.md5) of the SAME
    derived multibyte column — independent of both engines' SQL
    layers."""
    import hashlib

    from bigquery_postgres_events_etl_spark.io import load_table
    from bigquery_postgres_events_etl_spark.operators.queries_text import (
        _UNI_SNIPPETS,
        q_text_stats_unicode,
    )

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)

    texts = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .where("doc_id < 25").collect()
    }
    got = {
        r.doc_id: r
        for r in q_text_stats_unicode(spark, sf_dir).where("doc_id < 25").collect()
    }
    assert set(got) == set(texts)
    for did, text in texts.items():
        utext = text + " " + _UNI_SNIPPETS[did % 5]
        toks = utext.split(" ")
        r = got[did]
        assert r.n_chars == len(utext), did
        assert r.n_bytes == len(utext.encode("utf-8")), did
        assert r.n_tokens == len(toks), did
        assert r.n_distinct_tokens == len(set(toks)), did
        assert r.utext_h60 == h60(utext), did
        assert r.min_token_h60 == min(h60(t) for t in toks), did


def test_unigram_kernel_codepoint_exact_on_unicode(udocs):
    """The fused-Viterbi unigram trainer (r13: Python-slicing kernel)
    must match the pure-Python hard-EM reference EXACTLY on hostile
    unicode — multibyte pieces, combining marks, emoji (incl. beyond
    the BMP), RTL — pinning that the kernel's slicing, the Spark-side
    substring grid, and the length filter all operate on CODEPOINTS.
    (The 17-codepoint CJK word also pins the max_word exclusion on
    codepoints, not bytes.)"""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_text_quality import _unigram_reference

    from bigquery_postgres_events_etl_spark.operators.text import (
        unigram_lm_train,
    )

    got = sorted(
        (r.piece, r.freq, r.cost_fp) for r in unigram_lm_train(udocs).collect()
    )
    want = _unigram_reference([t for _, t in UNICODE_DOCS])
    assert got == want
    # multibyte pieces actually survived training (not silently dropped)
    assert any(any(ord(ch) > 127 for ch in p) for p, _, _ in got)


def test_bpe_train_codepoint_exact_on_unicode(udocs):
    """BPE training on the hostile corpus must match the pure-Python
    reference EXACTLY — including the empty-token case: the
    double-space doc yields '' tokens, and Spark's sequence(1, 0)
    (negative-step default → [1, 0]) used to split '' into TWO empty
    symbols, minting a bogus ('','') merge that outvoted real pairs
    (the r13 unicode-corpus find; reference and DuckDB oracle both
    treat '' as zero symbols)."""
    import os
    import sys
    from collections import Counter

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_text_quality import _reference_bpe

    from bigquery_postgres_events_etl_spark.operators.text import bpe_train

    freqs = Counter(
        tok for _, t in UNICODE_DOCS for tok in t.split(" ")
    )
    want = _reference_bpe(dict(freqs))
    got = [
        (r.rank, r.left, r.right, r.merged, r.n_occurrences)
        for r in bpe_train(udocs).orderBy("rank").collect()
    ]
    assert got == want
    # no merge may involve an empty symbol
    assert all(a != "" and b != "" for _, a, b, _, _ in got)
    # multibyte merges actually formed
    assert any(any(ord(ch) > 127 for ch in m) for _, _, _, m, _ in got)


def test_levenshtein_counts_codepoints_not_bytes(spark):
    """Spark's levenshtein (the edit-distance dedup verify) must count
    CODEPOINT edits on multibyte text — pinned against a pure-Python
    DP, with the documented DuckDB-bytes divergence asserted so the
    oracle-scope note in dedup_edit_distance_pairs stays true."""
    import duckdb
    from pyspark.sql import functions as F

    def py_lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    pairs = [
        ("héllo wörld", "hello world"),      # 2 codepoint subs, 4 byte edits
        ("naïve café", "naive cafe"),
        ("🚀🔥", "🚀"),                        # astral-plane deletion
        ("日本語", "日本誤"),
        ("", "abc"),
        ("héllo", "héllo"),
    ]
    df = spark.createDataFrame(pairs, "a string, b string").select(
        "a", "b", F.levenshtein("a", "b").alias("d")
    )
    got = {(r.a, r.b): r.d for r in df.collect()}
    for a, b in pairs:
        assert got[(a, b)] == py_lev(a, b), (a, b)
    # the documented oracle divergence: DuckDB counts bytes
    dk = duckdb.connect().execute(
        "SELECT levenshtein('héllo wörld', 'hello world')"
    ).fetchone()[0]
    assert dk == 4 and got[("héllo wörld", "hello world")] == 2
