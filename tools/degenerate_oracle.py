"""Cross-engine oracle check on DEGENERATE corpora (empty tables).

The driver fixtures always have data, so a zero-denominator /
zero-group / empty-input divergence (Spark ANSI DIVIDE_BY_ZERO vs
DuckDB NaN, silently shrunk codebooks, schema-width collapses) can
hide until production hits a zero-traffic partition. This tool builds
three corpora — empty ``documents``, empty ``embeddings``, empty
``events`` (all other tables intact from sf0.001) — and runs the
matching entry families through tools/check_oracle.py.

Round-13 proof of value: first run caught three ANSI DIVIDE_BY_ZERO
crashes (funnel_time_to_convert, funnel_window_constrained,
events_segment_overlap_hll), all NULLIF-hardened the same round.

Expected failures — the DOCUMENTED fail-loud tier (asymmetry noted in
each entry's docstring: Spark raises, the oracle would silently shrink
the codebook / fit on nothing): frozen-codebook guards and Spark-ML
``.fit`` on empty input. These count as PASS here.

Usage: python tools/degenerate_oracle.py
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC_SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

# (emptied table, check_oracle filters)
SWEEPS = [
    ("documents", ["text_", "dedup_", "!dedup_edit_distance",
                   "pipeline_", "ml_eval_"]),
    ("embeddings", ["similarity_", "embedding_", "dedup_semantic",
                    "ml_kmeans", "pipeline_kcenter"]),
    ("events", ["events_", "stats_", "funnel_", "cohort_", "ml_logreg",
                "ml_perceptron", "sessionization", "tumbling",
                "sliding", "etl_"]),
]

# documented fail-loud entries: Spark raises by design on the empty /
# sparse-id corpus while the oracle would return rows (see each
# docstring's "Degenerate-input asymmetry" note)
EXPECTED_FAIL_LOUD = {
    "embeddings": {
        "dedup_semantic_frozen",     # frozen-codebook guard (ADVICE r11)
        "dedup_semantic_fixed_size", # k clamped to 1, ids 0..0 missing
        "ml_kmeans_train_q8",        # frozen-init guard
        "dedup_semantic_kmeans",     # Spark-ML KMeans.fit on empty input
        "similarity_ann_ivf",        # Spark-ML KMeans.fit on empty input
    },
}


def main() -> None:
    bad = 0
    for empty_table, filters in SWEEPS:
        d = tempfile.mkdtemp(prefix=f"degen_{empty_table}_")
        try:
            import pyarrow.parquet as pq

            for t in TABLES:
                if t == empty_table:
                    src = pq.read_table(os.path.join(SRC_SF, f"{t}.parquet"))
                    pq.write_table(
                        src.slice(0, 0), os.path.join(d, f"{t}.parquet")
                    )
                else:
                    shutil.copy(os.path.join(SRC_SF, f"{t}.parquet"), d)
            proc = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "tools", "check_oracle.py"), d, *filters],
                capture_output=True, text=True, cwd=REPO,
            )
            expected = EXPECTED_FAIL_LOUD.get(empty_table, set())
            fails = [
                ln.split()[1].rstrip(":") for ln in proc.stdout.splitlines()
                if ln.startswith("FAIL")
            ]
            unexpected = [f for f in fails if f not in expected]
            missing = [e for e in expected if e not in fails]
            print(f"empty {empty_table}: "
                  f"{sum(1 for ln in proc.stdout.splitlines() if ln.startswith(('OK', 'ok?')))} ok, "
                  f"{len(fails)} fail-loud ({len(unexpected)} unexpected)")
            for f in unexpected:
                print(f"  UNEXPECTED FAIL {f}")
                bad += 1
            for e in missing:
                print(f"  EXPECTED fail-loud {e} did NOT fail "
                      f"(guard removed?)")
                bad += 1
        finally:
            shutil.rmtree(d, ignore_errors=True)

    # collapsed-dimension legs (r14): the stream is NON-empty but one
    # dimension is degenerate — shapes real filtered partitions / tiny
    # tenants / bulk-loaded batches produce, unreachable by the
    # empty-table legs. First runs caught NINE real bugs, all fixed
    # the same round: one-type → events_ks_test / stats_mann_whitney /
    # stats_chi_square_independence ANSI crashes; one-user →
    # events_ab_ttest / events_ab_proportion_ztest /
    # events_power_analysis crashes; const-ts → stats_spearman_rho /
    # events_cuped_adjustment crashes AND the etl_flagship survivor
    # tie-break VALUE bug (VARCHAR vs BIGINT event_id ordering).
    _EVENT_FILTERS = [
        "events_", "stats_", "funnel_", "cohort_", "sessionization",
        "tumbling", "sliding", "etl_", "ml_logreg", "ml_perceptron",
    ]
    COLLAPSED_LEGS = [
        ("one-type", """SELECT event_id, ts, user_id,
            CAST('click' AS VARCHAR) AS event_type, value, props FROM SRC"""),
        ("one-user", """SELECT event_id, ts, CAST(13 AS BIGINT) AS user_id,
            event_type, value, props FROM SRC"""),
        ("const-ts", """SELECT event_id,
            TIMESTAMP '2024-01-05 12:00:00' AS ts, user_id, event_type,
            value, props FROM SRC"""),
    ]
    import duckdb

    for leg, sql in COLLAPSED_LEGS:
        d = tempfile.mkdtemp(prefix=f"degen_{leg}_")
        try:
            for t in TABLES:
                src_path = os.path.join(SRC_SF, f"{t}.parquet")
                if t == "events":
                    duckdb.connect().execute(
                        f"COPY ({sql.replace('SRC', repr(src_path))}) TO "
                        f"'{os.path.join(d, 'events.parquet')}' (FORMAT PARQUET)"
                    )
                else:
                    shutil.copy(src_path, d)
            proc = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "tools", "check_oracle.py"), d,
                 *_EVENT_FILTERS],
                capture_output=True, text=True, cwd=REPO,
            )
            fails = [
                ln.split()[1].rstrip(":") for ln in proc.stdout.splitlines()
                if ln.startswith("FAIL")
            ]
            print(f"{leg} events: "
                  f"{sum(1 for ln in proc.stdout.splitlines() if ln.startswith(('OK', 'ok?')))} ok, "
                  f"{len(fails)} fail ({len(fails)} unexpected)")
            for f in fails:
                print(f"  UNEXPECTED FAIL {f}")
                bad += 1
        finally:
            shutil.rmtree(d, ignore_errors=True)

    print(f"\n{bad} unexpected degenerate-corpus findings")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
