"""Cross-engine oracle check on EXTREME-magnitude corpora.

The driver fixtures keep values O(100) and documents O(40 tokens), so
an integer/decimal-overflow divergence — Spark widening a product
where DuckDB's int64 decimal fast path raises, a BIGINT sum
overflowing only at real magnitudes, a fixed-point term leaving its
designed range — can hide until production meets real revenue numbers
or book-length documents. This tool builds three corpora beside the
sf0.001 tables and runs the matching entry families through
tools/check_oracle.py:

- ``events``: value × 1e6 (per-user metrics ~1e9–1e10; their squares
  cross the DECIMAL(18) int64 ceiling — the class that caught
  events_ab_sequential's oracle on first run, fixed the same session
  by following the ttest oracle's DECIMAL(19,4) int128 path);
- ``prices``: o_totalprice / l_extendedprice / ps_supplycost × 1e6
  (revenue sums ~1e15 — the DECIMAL(27,4) headroom band);
- ``documents``: each text tiled to ~1500 tokens (per-doc decimal
  ln-sums ~1e3–1e4, DoReMi loss_fp ~1e9 → w·loss_fp products ~1e18 —
  the exact band of the r13 ADVICE HUGEINT fix, now VALIDATED
  empirically rather than by inspection).

The ×1e6 factor is deliberate: it crosses every int64 product ceiling
while keeping per-VALUE x·10^4 well under 2^53, so the _dsum
double→decimal cast stays bit-exact on both engines. SUMS can still
leave the 2^53 band — see EXPECTED_DIVERGENT below: q1's
sum_disc_price at price×1e6 is the asserted marker for the
decimal→double band (both engines double-round there with
engine-specific detail; the registry header documents the band and
the scheduled both-sides string-round-trip migration). The marker is
asserted BOTH ways, the degenerate sweep's convention: if it stops
diverging, the migration landed and the marker must move to the
in-band tier.

Round-14 proof of value: first run caught a real oracle bug
(events_ab_sequential ss_dec at DECIMAL(18,4) — DuckDB's int64
decimal multiply raised where Spark's (37,8) product widened; fixed
to the ttest oracle's DECIMAL(19,4) int128 path) and mapped the
decimal→double band empirically (one-sided exact-rounding fixed q1
but flipped anova — both engines' float paths must move together).

Usage: python tools/extreme_oracle.py
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

SCALE = "1e6"
DOC_TILE = 40          # ~40 copies of each text ≈ 1500 tokens/doc
DOC_LIMIT = 60         # docs kept in the long-doc corpus

# (corpus name, {table: transform SQL or None}, check_oracle filters)
SWEEPS = [
    (
        "events",
        {
            "events": f"""SELECT event_id, ts, user_id, event_type,
                          value * {SCALE} AS value, props FROM src"""
        },
        ["events_", "stats_", "funnel_", "cohort_", "sessionization",
         "tumbling", "sliding", "etl_", "ml_logreg", "ml_perceptron"],
    ),
    (
        "prices",
        {
            "orders": f"""SELECT * REPLACE (
                          o_totalprice * {SCALE} AS o_totalprice)
                          FROM src""",
            "lineitem": f"""SELECT * REPLACE (
                          l_extendedprice * {SCALE} AS l_extendedprice)
                          FROM src""",
        },
        ["orders_", "lineitem_", "agg_variance_from_sums",
         "agg_correlation_from_sums", "stats_winsorize_lineitem",
         "rfm_", "q1_pricing_summary"],
    ),
    (
        "documents",
        {
            "documents": f"""SELECT doc_id, source, lang,
                          n_chars * {DOC_TILE} AS n_chars,
                          array_to_string(
                            list_transform(range(1, {DOC_TILE} + 1),
                                           i -> text), ' ') AS text
                          FROM src WHERE doc_id < {DOC_LIMIT}"""
        },
        # the ln/fixed-point NB chain + mixture arithmetic; the heavy
        # quadratic verify tiers and byte-oracle-scoped edit distance
        # are excluded for the same reasons as the unicode sweep
        ["text_nb", "text_bm25", "text_tfidf", "text_token_entropy",
         "text_bigram", "text_quality", "text_stats",
         "ml_eval_auc_nb", "ml_eval_ece", "ml_eval_avg_precision_nb",
         "ml_eval_conformal", "pipeline_doremi_weights",
         "pipeline_quality_filter", "pipeline_importance_weight"],
    ),
]


# sites whose sums leave the 2^53 decimal→double band on the extreme
# corpus: both engines double-round with engine-specific last-bit
# detail (registry.py header), so a hash MISMATCH is the expected
# state until the r15 both-sides string-round-trip migration —
# asserted both ways like the degenerate sweep's fail-loud tier
EXPECTED_DIVERGENT: dict[str, set[str]] = {
    "prices": {"q1_pricing_summary"},
}


def main() -> None:
    import duckdb

    bad = 0
    for name, transforms, filters in SWEEPS:
        d = tempfile.mkdtemp(prefix=f"extreme_{name}_")
        try:
            for t in TABLES:
                src_path = os.path.join(SRC_SF, f"{t}.parquet")
                dst_path = os.path.join(d, f"{t}.parquet")
                sql = transforms.get(t)
                if sql is None:
                    shutil.copy(src_path, dst_path)
                else:
                    con = duckdb.connect()
                    con.execute(
                        f"CREATE VIEW src AS SELECT * FROM '{src_path}'"
                    )
                    con.execute(
                        f"COPY ({sql}) TO '{dst_path}' (FORMAT PARQUET)"
                    )
                    con.close()
            proc = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "tools", "check_oracle.py"), d, *filters],
                capture_output=True, text=True, cwd=REPO,
            )
            fails = [
                ln.split()[1].rstrip(":") for ln in proc.stdout.splitlines()
                if ln.startswith("FAIL")
            ]
            n_ok = sum(
                1 for ln in proc.stdout.splitlines()
                if ln.startswith(("OK", "ok?"))
            )
            expected = EXPECTED_DIVERGENT.get(name, set())
            unexpected = [f for f in fails if f not in expected]
            missing = [e for e in expected if e not in fails]
            print(f"extreme {name}: {n_ok} ok, {len(fails)} divergent "
                  f"({len(unexpected)} unexpected)")
            for f in unexpected:
                print(f"  UNEXPECTED FAIL {f}")
                bad += 1
            for e in missing:
                print(f"  EXPECTED divergent {e} now hashes — the "
                      f"round-trip migration landed? move it in-band")
                bad += 1
            if proc.returncode != 0 and not fails:
                print(f"  check_oracle exited {proc.returncode} with no "
                      f"FAIL lines:\n{proc.stdout[-2000:]}\n{proc.stderr[-500:]}")
                bad += 1
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print(f"\n{bad} unexpected extreme-corpus findings")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
