"""Hypothesis testing, drift monitoring, and lifecycle analytics.

The inference layer over the events/orders stream: two-sample
distribution tests (KS, Mann-Whitney), independence/conformance tests
(chi-square, Benford), the two-proportion conversion z-test with
Wilson intervals, distribution-drift monitoring (PSI), lifecycle
curves (Kaplan-Meier survival + log-rank comparison, cohort LTV,
funnel time-to-convert, EWMA smoothing), seasonality-aware residual
anomaly detection, and the ECDF quantile feature transform. The
reference pipeline feeds BI dashboards from Postgres
(flask_server.py:120-180 serves aggregate endpoints); these are the
statistical read-side operators such a warehouse is asked for next.

Oracle-parity rules (registry header): integer/exact-decimal
aggregation everywhere, `ln()` contributions rounded to DECIMAL(20,9)
before exact decimal sums (the BM25 idiom — JVM vs libm ln differs by
1 ulp on ~8% of inputs), every other float op (+,-,*,/,sqrt,exp-once)
is a fixed IEEE chain over identical inputs.

Scale notes per operator; the only unpartitioned windows are
(a) the two-pass cumsum internals (bounded per-partition stats) and
(b) the Kaplan-Meier life table, whose row count is calendar-bounded
(distinct gap lengths in days ≤ the fixture's date span), both
declared in tests/test_plans.py::GLOBAL_WINDOW_ALLOWLIST.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from .ranking import with_global_cumsum

_TS = "CAST(ts AS TIMESTAMP)"

# pack two non-negative counts into one decimal so ONE distributed
# cumulative-sum pass yields both running totals: packed = a*M + b.
# M must exceed any possible total count; 10^12 covers 10^12 rows and
# keeps a*M + b inside DECIMAL(38,0) for totals up to 10^26.
_PACK_M = 10**12


def _packed_cum(df: DataFrame, a_col: str, b_col: str, key: str) -> DataFrame:
    """Distributed exact running totals of TWO count columns in key
    order with a single two-pass cumsum (ranking.with_global_cumsum):
    the counts are packed into one DECIMAL(38,0), cum-summed, then
    unpacked with exact-divisible arithmetic (the subtraction makes the
    division exact, so no rounding can flip the quotient)."""
    m = F.lit(_PACK_M).cast("decimal(19,0)")
    packed = (
        F.col(a_col).cast("decimal(19,0)") * m + F.col(b_col).cast("decimal(19,0)")
    ).alias("_packed")
    cum = with_global_cumsum(
        df.select("*", packed), [(key, "asc")], [], "_packed"
    )
    cum_b = F.col("cum_sum") % m
    tot_b = F.col("total_sum") % m
    return cum.select(
        "*",
        ((F.col("cum_sum") - cum_b) / m).cast("long").alias("_cum_a"),
        cum_b.cast("long").alias("_cum_b"),
        ((F.col("total_sum") - tot_b) / m).cast("long").alias("_tot_a"),
        tot_b.cast("long").alias("_tot_b"),
    ).drop("_packed", "cum_sum", "total_sum", "rn", "n_total")


def _ab_counts(spark: SparkSession, sf_dir: str, a: str, b: str) -> DataFrame:
    """Per-distinct-value sample counts for two event types — the
    shared scaffold of the rank/ECDF tests. One hash aggregation; the
    grouped frame is |distinct values|, far smaller than the stream."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.where(F.col("event_type").isin(a, b))
        .groupBy("value")
        .agg(
            F.sum(F.when(F.col("event_type") == a, 1).otherwise(0)).alias("a_cnt"),
            F.sum(F.when(F.col("event_type") == b, 1).otherwise(0)).alias("b_cnt"),
        )
    )


# ---------------------------------------------------------------------
# two-sample Kolmogorov–Smirnov
# ---------------------------------------------------------------------


@register(
    "events_ks_test",
    """
    WITH ab AS (
      SELECT value,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS a_cnt,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS b_cnt
      FROM events WHERE event_type IN ('click', 'purchase') GROUP BY value
    ),
    cum AS (
      SELECT CAST(SUM(a_cnt) OVER (ORDER BY value) AS BIGINT) AS ca,
             CAST(SUM(b_cnt) OVER (ORDER BY value) AS BIGINT) AS cb
      FROM ab
    ),
    tot AS (SELECT CAST(SUM(a_cnt) AS BIGINT) AS n1, CAST(SUM(b_cnt) AS BIGINT) AS n2 FROM ab)
    SELECT n1, n2,
           CAST(MAX(ABS(ca * n2 - cb * n1)) AS BIGINT) AS d_num,
           CAST(MAX(ABS(ca * n2 - cb * n1)) AS DOUBLE)
             / NULLIF(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE), 0) AS d_stat,
           CAST(1.358 AS DOUBLE)
             * sqrt(CAST(n1 + n2 AS DOUBLE) / NULLIF(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE), 0)) AS d_crit_05,
           CAST(MAX(ABS(ca * n2 - cb * n1)) AS DOUBLE)
             / NULLIF(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE), 0)
             > CAST(1.358 AS DOUBLE)
               * sqrt(CAST(n1 + n2 AS DOUBLE) / NULLIF(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE), 0)) AS reject_05
    FROM cum CROSS JOIN tot
    GROUP BY n1, n2
    """,
)
def events_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test (click vs purchase values):
    D = sup |F1 − F2| over the pooled support, computed entirely in
    integers — |cumA·n2 − cumB·n1| — with ONE final division.

    Scale shape: a hash agg collapses the stream to |distinct values|
    rows, then the two-pass distributed cumsum (no unpartitioned
    window over data; both running counts ride one packed DECIMAL
    column) and a scalar max-aggregate. The asymptotic α=0.05
    threshold 1.358·sqrt((n1+n2)/(n1·n2)) ships alongside so the
    verdict is in the row, not a lookup table.
    """
    ab = _ab_counts(spark, sf_dir, "click", "purchase")
    cum = _packed_cum(ab, "a_cnt", "b_cnt", "value")
    ca, cb = F.col("_cum_a"), F.col("_cum_b")
    n1, n2 = F.col("_tot_a"), F.col("_tot_b")
    stat = cum.groupBy(n1.alias("n1"), n2.alias("n2")).agg(
        F.max(F.abs(ca * n2 - cb * n1)).cast("long").alias("d_num")
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    # NULLIF pins the one-empty-sample corpus (a single-event-type
    # partition: n1 or n2 = 0) to NULL on BOTH engines — Spark ANSI
    # raises DIVIDE_BY_ZERO and DuckDB yields inf otherwise (the r14
    # single-level-vocabulary sweep find, the funnel r13 class)
    nn = F.nullif(n1d * n2d, F.lit(0.0))
    d = F.col("d_num").cast("double") / nn
    crit = F.lit(1.358).cast("double") * F.sqrt(
        (F.col("n1") + F.col("n2")).cast("double") / nn
    )
    return stat.select(
        "n1", "n2", "d_num",
        d.alias("d_stat"),
        crit.alias("d_crit_05"),
        (d > crit).alias("reject_05"),
    )


# ---------------------------------------------------------------------
# Mann–Whitney U (rank-sum) with tie correction
# ---------------------------------------------------------------------


@register(
    "stats_mann_whitney",
    """
    WITH ab AS (
      SELECT value,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS a_cnt,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS b_cnt
      FROM events WHERE event_type IN ('click', 'purchase') GROUP BY value
    ),
    cum AS (
      SELECT a_cnt, a_cnt + b_cnt AS t,
             CAST(SUM(a_cnt + b_cnt) OVER (ORDER BY value) AS BIGINT) AS ct
      FROM ab
    ),
    sums AS (
      SELECT CAST(SUM(a_cnt * (2 * (ct - t) + t + 1)) AS BIGINT) AS two_r1,
             CAST(CAST(SUM(CAST(t AS DECIMAL(38,0)) * t * t - t) AS VARCHAR) AS DOUBLE) AS tie_sum,
             (SELECT CAST(SUM(a_cnt) AS BIGINT) FROM ab) AS n1,
             (SELECT CAST(SUM(b_cnt) AS BIGINT) FROM ab) AS n2
      FROM cum
    )
    SELECT n1, n2,
           (CAST(two_r1 AS DOUBLE) - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1))
             / CAST(2 AS DOUBLE) AS u1,
           CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / CAST(2 AS DOUBLE) AS mu_u,
           sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / CAST(12 AS DOUBLE)
                * ((CAST(n1 + n2 AS DOUBLE) + 1)
                   - tie_sum / NULLIF(CAST(n1 + n2 AS DOUBLE) * (CAST(n1 + n2 AS DOUBLE) - 1), 0))) AS sigma_u,
           ((CAST(two_r1 AS DOUBLE) - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1))
              / CAST(2 AS DOUBLE)
            - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / CAST(2 AS DOUBLE))
           / NULLIF(sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / CAST(12 AS DOUBLE)
                  * ((CAST(n1 + n2 AS DOUBLE) + 1)
                     - tie_sum / NULLIF(CAST(n1 + n2 AS DOUBLE) * (CAST(n1 + n2 AS DOUBLE) - 1), 0))), 0) AS z
    FROM sums
    """,
)
def stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test with tie correction — the
    distribution-free alternative to the t-test (events_ab_ttest)
    when metric distributions are skewed, which engagement metrics
    always are.

    Average tie ranks never materialize: with cum_before = cumulative
    pooled count strictly before a value and t its tie-group size,
    2·R1 = Σ a·(2·cum_before + t + 1) stays in exact integers, as does
    the tie term Σ(t³−t); μ, σ (tie-corrected) and z are one fixed
    IEEE chain at the end. Same |distinct values| hash-agg + two-pass
    cumsum shape as the KS test, single-column cumsum (no packing
    needed — only the pooled running count is required).
    """
    ab = _ab_counts(spark, sf_dir, "click", "purchase")
    witht = ab.select(
        "*", (F.col("a_cnt") + F.col("b_cnt")).alias("t")
    )
    cum = with_global_cumsum(witht, [("value", "asc")], [], "t")
    t, ct, a = F.col("t"), F.col("cum_sum"), F.col("a_cnt")
    sums = cum.agg(
        F.sum(a * (F.lit(2) * (ct - t) + t + F.lit(1))).cast("long").alias("two_r1"),
        F.sum(t.cast("decimal(38,0)") * t * t - t).cast("string").cast("double").alias("tie_sum"),
        F.sum(a).cast("long").alias("n1"),
        F.sum("b_cnt").cast("long").alias("n2"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    u1 = (F.col("two_r1").cast("double") - n1d * (n1d + 1)) / F.lit(2).cast("double")
    mu = n1d * n2d / F.lit(2).cast("double")
    # NULLIF pins the degenerate corpora to NULL on BOTH engines (the
    # r14 single-level-vocabulary sweep find): n ≤ 1 pooled samples
    # zero the tie-term denominator, and an empty sample (n1·n2 = 0)
    # zeroes sigma so z would divide by zero
    sigma = F.sqrt(
        n1d * n2d / F.lit(12).cast("double")
        * ((nd + 1) - F.col("tie_sum") / F.nullif(nd * (nd - 1), F.lit(0.0)))
    )
    return sums.select(
        "n1", "n2",
        u1.alias("u1"),
        mu.alias("mu_u"),
        sigma.alias("sigma_u"),
        ((u1 - mu) / F.nullif(sigma, F.lit(0.0))).alias("z"),
    )


# ---------------------------------------------------------------------
# chi-square test of independence
# ---------------------------------------------------------------------


@register(
    "stats_chi_square_independence",
    """
    WITH base AS (
      SELECT event_type, CAST(user_id % 4 AS INTEGER) AS segment
      FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ),
    cells AS (
      SELECT event_type, segment, CAST(count(*) AS BIGINT) AS o
      FROM base GROUP BY 1, 2
    ),
    rows_ AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
    cols_ AS (SELECT segment, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(o) AS BIGINT) AS n,
             CAST(count(DISTINCT event_type) AS BIGINT) AS tl,
             CAST(count(DISTINCT segment) AS BIGINT) AS sl
      FROM cells
    ),
    terms AS (
      SELECT n, tl, sl,
             CAST(FLOOR((CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                  / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                  * 1000000000.0 + 0.5) AS DECIMAL(28,0)) AS term
      FROM cells
      JOIN rows_ USING (event_type) JOIN cols_ USING (segment) CROSS JOIN tot
    )
    SELECT MAX(n) AS n, MAX(tl) AS type_levels, MAX(sl) AS segment_levels,
           (MAX(tl) - 1) * (MAX(sl) - 1) AS dof,
           CAST(SUM(term) AS DOUBLE) / 1000000000.0 AS chi2,
           sqrt(CAST(SUM(term) AS DOUBLE) / 1000000000.0
                / NULLIF(CAST(MAX(n) AS DOUBLE) * CAST(least(MAX(tl) - 1, MAX(sl) - 1) AS DOUBLE), 0)) AS cramers_v
    FROM terms
    """,
)
def stats_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence (event_type × user
    segment) + Cramér's V effect size. The contingency table is one
    hash aggregation; margins re-aggregate the CELL table (|types| ×
    |segments| rows, never the stream again); per-cell terms
    (o−e)²/e — exact-integer inputs through one deterministic IEEE
    chain — scale to integers via floor(x·1e9+0.5) (identical chain on
    both engines; a raw double→decimal CAST is engine-divergent near
    boundaries) so the 20-cell sum is order-independent. Everything after the first groupBy is
    constant-cardinality, broadcast by AQE."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    cells = e.groupBy(
        "event_type", (F.col("user_id") % 4).cast("int").alias("segment")
    ).agg(F.count(F.lit(1)).alias("o"))
    rows_ = cells.groupBy("event_type").agg(F.sum("o").cast("long").alias("r"))
    cols_ = cells.groupBy("segment").agg(F.sum("o").cast("long").alias("c"))
    tot = cells.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("event_type").alias("tl"),
        F.countDistinct("segment").alias("sl"),
    )
    j = cells.join(rows_, "event_type").join(cols_, "segment").crossJoin(tot)
    od = F.col("o").cast("double")
    ed = F.col("r").cast("double") * F.col("c").cast("double") / F.col("n").cast("double")
    # floor(x·1e9+0.5): explicit IEEE-chain scaling instead of an
    # engine-divergent double→decimal CAST (the logrank sf0.1 lesson —
    # (o−e)²/e magnitudes put x·1e9 in the ulp range where the two
    # engines' cast paths can disagree)
    term = F.floor(
        (od - ed) * (od - ed) / ed * F.lit(1e9).cast("double")
        + F.lit(0.5).cast("double")
    ).cast("decimal(28,0)")
    agg = j.agg(
        F.max("n").alias("n"),
        F.max("tl").alias("type_levels"),
        F.max("sl").alias("segment_levels"),
        F.sum(term).alias("chi2_dec"),
    )
    chi2 = F.col("chi2_dec").cast("double") / F.lit(1e9).cast("double")
    dof_min = F.least(F.col("type_levels") - 1, F.col("segment_levels") - 1)
    return agg.select(
        "n", "type_levels", "segment_levels",
        ((F.col("type_levels") - 1) * (F.col("segment_levels") - 1)).alias("dof"),
        chi2.alias("chi2"),
        # NULLIF: a single-level factor (one event type in the
        # partition) makes min(r−1, c−1) = 0 — Cramér's V is undefined
        # there, NULL on both engines (the r14 sweep find)
        F.sqrt(
            chi2
            / F.nullif(
                F.col("n").cast("double") * dof_min.cast("double"), F.lit(0.0)
            )
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------
# Benford first-digit conformance
# ---------------------------------------------------------------------

# expected shares log10(1 + 1/d) as shared literals: computed ONCE here
# and formatted into BOTH plans, so no cross-engine log arithmetic at all
_BENFORD = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}
_BENFORD_SQL_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN CAST({v!r} AS DOUBLE)" for d, v in _BENFORD.items()
) + " END"


@register(
    "orders_benford_first_digit",
    f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM orders
    ),
    obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM digits GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM obs),
    terms AS (
      SELECT digit, n_obs, n_total,
             CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE) AS obs_share,
             {_BENFORD_SQL_CASE} AS exp_share
      FROM obs CROSS JOIN tot
    ),
    scored AS (
      SELECT *,
             CAST((CAST(n_obs AS DOUBLE) - CAST(n_total AS DOUBLE) * exp_share)
                  * (CAST(n_obs AS DOUBLE) - CAST(n_total AS DOUBLE) * exp_share)
                  / (CAST(n_total AS DOUBLE) * exp_share) AS DECIMAL(20,9)) AS term
      FROM terms
    )
    SELECT digit, n_obs, n_total, obs_share, exp_share,
           CAST(term AS DOUBLE) AS chi2_term,
           (SELECT CAST(SUM(term) AS DOUBLE) FROM scored) AS chi2_total
    FROM scored
    """,
)
def orders_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit conformance of order totals — the
    classic anomaly/fraud screen on financial facts. The first
    significant digit comes from exact decimal string arithmetic (no
    cross-engine log10: the expected shares are Python-computed
    literals formatted into BOTH plans). One digit hash-agg (9 rows),
    chi-square contributions rounded to DECIMAL(20,9), total re-joined
    as a broadcast scalar."""
    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .cast("string"),
        1,
        1,
    ).cast("int")
    obs = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    tot = obs.agg(F.sum("n_obs").cast("long").alias("n_total"))
    exp_share: Column = F.lit(None).cast("double")
    for d, v in _BENFORD.items():
        exp_share = F.when(F.col("digit") == d, F.lit(v)).otherwise(exp_share)
    terms = obs.crossJoin(tot).select(
        "digit", "n_obs", "n_total",
        (F.col("n_obs").cast("double") / F.col("n_total").cast("double")).alias("obs_share"),
        exp_share.alias("exp_share"),
    )
    e = F.col("n_total").cast("double") * F.col("exp_share")
    term = (
        (F.col("n_obs").cast("double") - e) * (F.col("n_obs").cast("double") - e) / e
    ).cast("decimal(20,9)")
    scored = terms.select("*", term.alias("term"))
    total = scored.agg(F.sum("term").cast("double").alias("chi2_total"))
    return scored.crossJoin(total).select(
        "digit", "n_obs", "n_total", "obs_share", "exp_share",
        F.col("term").cast("double").alias("chi2_term"),
        "chi2_total",
    )


# ---------------------------------------------------------------------
# PSI distribution drift
# ---------------------------------------------------------------------


@register(
    "events_psi_drift",
    """
    WITH binned AS (
      SELECT CAST(floor(value / 50.0) AS BIGINT) AS bin,
             CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS ref_cnt,
             CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00' THEN 0 ELSE 1 END) AS BIGINT) AS cur_cnt
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(ref_cnt) AS BIGINT) AS n_ref,
             CAST(SUM(cur_cnt) AS BIGINT) AS n_cur,
             CAST(count(*) AS BIGINT) AS n_bins
      FROM binned
    ),
    scored AS (
      SELECT bin, ref_cnt, cur_cnt, n_bins,
             CAST(ref_cnt + 1 AS DOUBLE) / CAST(n_ref + n_bins AS DOUBLE) AS p_ref,
             CAST(cur_cnt + 1 AS DOUBLE) / CAST(n_cur + n_bins AS DOUBLE) AS p_cur,
             CAST((CAST(ref_cnt + 1 AS DOUBLE) / CAST(n_ref + n_bins AS DOUBLE)
                   - CAST(cur_cnt + 1 AS DOUBLE) / CAST(n_cur + n_bins AS DOUBLE))
                  * (CAST(CAST(ln(CAST(ref_cnt + 1 AS DOUBLE) / CAST(n_ref + n_bins AS DOUBLE)) AS DECIMAL(20,9))
                          - CAST(ln(CAST(cur_cnt + 1 AS DOUBLE) / CAST(n_cur + n_bins AS DOUBLE)) AS DECIMAL(20,9)) AS DOUBLE))
                  AS DECIMAL(20,12)) AS term
      FROM binned CROSS JOIN tot
    )
    SELECT bin, bin * CAST(50.0 AS DOUBLE) AS bin_low, ref_cnt, cur_cnt,
           p_ref, p_cur,
           (SELECT SUM(term) FROM scored) > CAST(0.2 AS DECIMAL(20,12)) AS drift_alert
    FROM scored
    """,
)
def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the event stream — the standard model-monitoring drift score
    (PSI > 0.2 = significant shift). Laplace-smoothed bin shares (+1
    per bin, so empty bins never divide by zero), per-bin
    (p−q)·ln(p/q) contributions with the lns rounded to DECIMAL(20,9)
    and the product re-rounded to DECIMAL(20,12) for the exact total.
    Bin count is value-range/50 — constant-bounded — so everything
    after the first hash-agg is scalar work.

    The raw psi_term/psi_total doubles are NOT in the compared output
    (the registry's transcendental boundary-safety rule: a ln within
    1 ulp of a decimal rounding boundary rounds differently across
    libm builds — the r5 weighted-sample failure class). The compared
    columns are the exact-rational bin shares plus the drift_alert
    verdict (a threshold boolean flips only if some ln boundary-flips
    AND the exact-decimal total sits within that 1e-12 flip of 0.2 —
    a double-rare joint event); psi_term/psi_total values are pinned
    against a pure-Python reference in tests/test_stattests.py via
    the _full frame."""
    return events_psi_drift_full(spark, sf_dir).drop("psi_term", "psi_total")


def events_psi_drift_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full PSI frame including the per-bin psi_term and the
    psi_total doubles — the user-facing surface; the registered entry
    compares the boundary-safe projection of this."""
    e = load_table(spark, sf_dir, "events")
    is_ref = F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp")
    # persist the constant-bounded bin frame: the totals scalar and
    # the per-bin scores both derive from it, and without the persist
    # the events hash-agg subtree repeats per consumer (4 full fact
    # scans in the optimized plan — the r5 repeated-scan class; at
    # 100 TB this is 3 free extra stream passes). ≤ value-range/50
    # rows, so the cache is bytes.
    binned = e.groupBy(
        F.floor(F.col("value") / F.lit(50.0)).cast("long").alias("bin")
    ).agg(
        F.sum(F.when(is_ref, 1).otherwise(0)).cast("long").alias("ref_cnt"),
        F.sum(F.when(is_ref, 0).otherwise(1)).cast("long").alias("cur_cnt"),
    ).persist()
    tot = binned.agg(
        F.sum("ref_cnt").cast("long").alias("n_ref"),
        F.sum("cur_cnt").cast("long").alias("n_cur"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    j = binned.crossJoin(tot)
    p_ref = (F.col("ref_cnt") + 1).cast("double") / (F.col("n_ref") + F.col("n_bins")).cast("double")
    p_cur = (F.col("cur_cnt") + 1).cast("double") / (F.col("n_cur") + F.col("n_bins")).cast("double")
    ln_diff = (
        F.log(p_ref).cast("decimal(20,9)") - F.log(p_cur).cast("decimal(20,9)")
    ).cast("double")
    term = ((p_ref - p_cur) * ln_diff).cast("decimal(20,12)")
    scored = j.select(
        "bin", "ref_cnt", "cur_cnt",
        p_ref.alias("p_ref"), p_cur.alias("p_cur"), term.alias("term"),
    )
    # drift_alert compares the EXACT decimal sum to an exact decimal
    # literal on both engines (never a double-vs-double threshold —
    # the decimal total is identical across engines unless a ln
    # boundary-flipped, and then the verdict still only flips if the
    # total sits within that 1e-12 of 0.2)
    total = scored.agg(F.sum("term").alias("psi_total_dec"))
    return scored.crossJoin(total).select(
        "bin",
        (F.col("bin") * F.lit(50.0).cast("double")).alias("bin_low"),
        "ref_cnt", "cur_cnt", "p_ref", "p_cur",
        F.col("term").cast("double").alias("psi_term"),
        F.col("psi_total_dec").cast("double").alias("psi_total"),
        (F.col("psi_total_dec") > F.lit("0.2").cast("decimal(20,12)")).alias(
            "drift_alert"
        ),
    )


# ---------------------------------------------------------------------
# Kaplan–Meier survival
# ---------------------------------------------------------------------


@register(
    "customer_survival_km",
    """
    WITH horizon AS (SELECT max(o_orderdate) AS h FROM orders),
    gaps AS (
      SELECT datediff('day', o_orderdate,
                      COALESCE(lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                               (SELECT h FROM horizon))) AS gap_days,
             CASE WHEN lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) IS NULL
                  THEN 0 ELSE 1 END AS event
      FROM orders
    ),
    life AS (
      SELECT CAST(gap_days AS INTEGER) AS gap_days,
             CAST(SUM(event) AS BIGINT) AS d_events,
             CAST(SUM(1 - event) AS BIGINT) AS c_censored
      FROM gaps GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(d_events + c_censored) AS BIGINT) AS n FROM life),
    risk AS (
      SELECT gap_days, d_events, c_censored,
             n - COALESCE(CAST(SUM(d_events + c_censored)
                   OVER (ORDER BY gap_days ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS at_risk
      FROM life CROSS JOIN tot
    ),
    surv AS (
      SELECT gap_days, d_events, c_censored, at_risk,
             CAST(d_events AS DOUBLE) / CAST(at_risk AS DOUBLE) AS hazard,
             SUM(CASE WHEN d_events < at_risk
                      THEN CAST(ln(CAST(1 AS DOUBLE) - CAST(d_events AS DOUBLE) / CAST(at_risk AS DOUBLE)) AS DECIMAL(20,9))
                      ELSE CAST(0 AS DECIMAL(20,9)) END)
               OVER (ORDER BY gap_days ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ln,
             CASE WHEN d_events = at_risk THEN 0 ELSE 1 END AS alive
      FROM risk
    )
    SELECT gap_days, at_risk, d_events, c_censored, hazard
    FROM surv WHERE d_events > 0
    """,
)
def customer_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival over customer inter-purchase gaps, with
    right-censoring at the data horizon (a customer's open-ended gap
    after their last order is censored, not an event) — the
    churn-model life table.

    Scale shape: gaps come from one per-customer lead window
    (partitioned — never global); the life table collapses to
    |distinct gap lengths| rows, CALENDAR-BOUNDED (≤ the date span in
    days — the declared GLOBAL_WINDOW_ALLOWLIST exemption, same class
    as events_wow_growth's |weeks| frame), so the at-risk/survival
    windows ride a bounded frame. Survival = exp(Σ ln(1−d/n)) with
    per-step lns rounded to DECIMAL(20,9) (exact cumulative sums). A
    d=n final step short-circuits to survival 0 (ln(0) never
    evaluates: both engines branch the CASE first).

    log_survival/survival are NOT in the compared output (registry
    transcendental boundary-safety rule — a ln/exp within 1 ulp of a
    decimal rounding boundary rounds differently across libm builds,
    the r5 weighted-sample failure class); the compared life table is
    all-integer plus the exact one-division hazard. The survival
    curve itself is pinned against a pure-Python Kaplan-Meier in
    tests/test_stattests.py via the _full frame."""
    return customer_survival_km_full(spark, sf_dir).drop(
        "log_survival", "survival"
    )


def customer_survival_km_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full life table including log_survival and the survival
    curve — the user-facing surface; the registered entry compares
    the boundary-safe projection of this."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    horizon = o.agg(F.max("o_orderdate").alias("h"))
    gaps = (
        o.select(
            "o_custkey", "o_orderdate", "o_orderkey", nxt.alias("nxt")
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            F.datediff(
                F.coalesce(F.col("nxt"), F.col("h")).cast("date"),
                F.col("o_orderdate").cast("date"),
            ).alias("gap_days"),
            F.when(F.col("nxt").isNull(), 0).otherwise(1).alias("event"),
        )
    )
    # persist the calendar-bounded life table: at-risk totals, the
    # cumulative window, and the total-n scalar all derive from it —
    # unpersisted, the per-customer lead-window subtree over orders
    # repeats per consumer (4 fact scans; the r5 repeated-scan class).
    # ≤ date-span-in-days rows, so the cache is bytes.
    life = gaps.groupBy(F.col("gap_days").cast("int").alias("gap_days")).agg(
        F.sum("event").cast("long").alias("d_events"),
        F.sum(F.lit(1) - F.col("event")).cast("long").alias("c_censored"),
    ).persist()
    tot = life.agg(F.sum(F.col("d_events") + F.col("c_censored")).cast("long").alias("n"))
    wd = Window.orderBy("gap_days")
    cum_prior = F.coalesce(
        F.sum(F.col("d_events") + F.col("c_censored"))
        .over(wd.rowsBetween(Window.unboundedPreceding, -1))
        .cast("long"),
        F.lit(0).cast("long"),
    )
    risk = life.crossJoin(F.broadcast(tot)).select(
        "gap_days", "d_events", "c_censored",
        (F.col("n") - cum_prior).alias("at_risk"),
    )
    dd = F.col("d_events").cast("double")
    nr = F.col("at_risk").cast("double")
    lnf = F.when(
        F.col("d_events") < F.col("at_risk"),
        F.log(F.lit(1).cast("double") - dd / nr).cast("decimal(20,9)"),
    ).otherwise(F.lit(0).cast("decimal(20,9)"))
    surv = risk.select(
        "*",
        (dd / nr).alias("hazard"),
        F.sum(lnf).over(wd.rowsBetween(Window.unboundedPreceding, 0)).alias("cum_ln"),
        F.when(F.col("d_events") == F.col("at_risk"), 0).otherwise(1).alias("alive"),
    )
    return surv.where(F.col("d_events") > 0).select(
        "gap_days", "at_risk", "d_events", "c_censored", "hazard",
        F.col("cum_ln").cast("double").alias("log_survival"),
        F.when(F.col("alive") == 0, F.lit(0).cast("double"))
        .otherwise(
            F.exp(F.col("cum_ln").cast("double")).cast("decimal(20,9)").cast("double")
        )
        .alias("survival"),
    )


# ---------------------------------------------------------------------
# cohort LTV curves
# ---------------------------------------------------------------------


@register(
    "cohort_ltv_curves",
    """
    WITH firsts AS (
      SELECT o_custkey, CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS cohort_month
      FROM orders GROUP BY 1
    ),
    sizes AS (SELECT cohort_month, CAST(count(*) AS BIGINT) AS cohort_size FROM firsts GROUP BY 1),
    cells AS (
      SELECT f.cohort_month,
             CAST(datediff('month', f.cohort_month, CAST(date_trunc('month', o.o_orderdate) AS DATE)) AS INTEGER) AS age_months,
             CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS active_customers,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev_dec
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
      GROUP BY 1, 2
    )
    SELECT c.cohort_month, c.age_months, s.cohort_size, c.active_customers,
           CAST(c.rev_dec AS DOUBLE) AS revenue,
           CAST(SUM(c.rev_dec) OVER (PARTITION BY c.cohort_month ORDER BY c.age_months
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_revenue,
           CAST(SUM(c.rev_dec) OVER (PARTITION BY c.cohort_month ORDER BY c.age_months
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(s.cohort_size AS DOUBLE) AS ltv_per_customer
    FROM cells c JOIN sizes s USING (cohort_month)
    """,
)
def cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by first-order
    month, cumulative revenue per cohort age — the growth-accounting
    view next to cohort_retention's activity view. Revenue folds in
    exact DECIMAL; the cumulative window is PARTITIONED by cohort (and
    the cell table is |cohorts|×|ages| ≤ calendar², tiny); the
    firsts join shuffles on custkey — same cardinality as the
    customer dimension, the intended sort-merge shape at scale."""
    o = load_table(spark, sf_dir, "orders")
    # persisted bounded intermediate (r6 verdict item #2): firsts is a
    # per-customer (custkey, month) sliver consumed by BOTH the sizes
    # aggregate and the cells join — unpersisted, each consumer
    # re-scanned orders (3 fact scans cold; now the fact scans twice:
    # once for firsts, once as the cells probe side)
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date").alias("cohort_month")
    ).persist()
    sizes = firsts.groupBy("cohort_month").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    cells = (
        o.join(firsts, "o_custkey")
        .groupBy(
            "cohort_month",
            F.months_between(
                F.date_trunc("month", "o_orderdate").cast("date"),
                F.col("cohort_month"),
            )
            .cast("int")
            .alias("age_months"),
        )
        .agg(
            F.countDistinct("o_custkey").alias("active_customers"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec"),
        )
    )
    wc = Window.partitionBy("cohort_month").orderBy("age_months").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = F.sum("rev_dec").over(wc).cast("double")
    return cells.join(sizes, "cohort_month").select(
        "cohort_month", "age_months", "cohort_size", "active_customers",
        F.col("rev_dec").cast("double").alias("revenue"),
        cum.alias("cum_revenue"),
        (cum / F.col("cohort_size").cast("double")).alias("ltv_per_customer"),
    )


# ---------------------------------------------------------------------
# EWMA smoothing with exact dyadic weights
# ---------------------------------------------------------------------

_EWMA_LAGS = 8  # half-life 1 day: weights 2^-k, k = 0..7 — exact decimals


def _ewma_weight(k: int) -> str:
    return repr(0.5**k)  # 2^-k is exact in decimal up to scale 7


@register(
    "events_ewma_halflife",
    f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', {_TS}) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM daily GROUP BY 1),
    spine AS (
      SELECT event_type,
             CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ),
    filled AS (
      SELECT s.event_type, s.day, COALESCE(d.n, 0) AS n
      FROM spine s LEFT JOIN daily d ON s.event_type = d.event_type AND s.day = d.day
    ),
    lagged AS (
      SELECT event_type, day, n,
             {", ".join(f"lag(n, {k}) OVER (PARTITION BY event_type ORDER BY day) AS l{k}" for k in range(_EWMA_LAGS))}
      FROM filled
    )
    SELECT event_type, day, CAST(n AS BIGINT) AS n_events,
           CAST({" + ".join(f"COALESCE(l{k} * CAST({_ewma_weight(k)} AS DECIMAL(10,7)), CAST(0 AS DECIMAL(10,7)))" for k in range(_EWMA_LAGS))} AS DOUBLE)
           / CAST({" + ".join(f"CASE WHEN l{k} IS NOT NULL THEN CAST({_ewma_weight(k)} AS DECIMAL(10,7)) ELSE CAST(0 AS DECIMAL(10,7)) END" for k in range(_EWMA_LAGS))} AS DOUBLE) AS ewma
    FROM lagged
    """,
)
def events_ewma_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily event counts
    with a one-day half-life — smoothing weights 2^-k are EXACT
    decimals, so the weighted sum is exact decimal arithmetic and the
    whole smoother is one division per row (no cross-engine pow/exp).
    Missing days enter as true zeros via a per-type day spine
    (sequence/generate_series — calendar-bounded); leading rows
    renormalize over the weights actually present. Windows are
    partitioned per event_type."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day"),
    )
    filled = spine.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lags = [F.lag("n", k).over(w) for k in range(_EWMA_LAGS)]
    zero = F.lit("0").cast("decimal(10,7)")
    num = None
    den = None
    for k, lg in enumerate(lags):
        wk = F.lit(_ewma_weight(k)).cast("decimal(10,7)")
        nk = F.coalesce(lg * wk, zero)
        dk = F.when(lg.isNotNull(), wk).otherwise(zero)
        num = nk if num is None else num + nk
        den = dk if den is None else den + dk
    return filled.select(
        "event_type", "day",
        F.col("n").cast("long").alias("n_events"),
        (num.cast("double") / den.cast("double")).alias("ewma"),
    )


# ---------------------------------------------------------------------
# log-rank test (stratified survival comparison)
# ---------------------------------------------------------------------


@register(
    "stats_logrank_test",
    """
    WITH seg AS (
      SELECT o.o_custkey, o.o_orderkey, o.o_orderdate,
             CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS grp
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    horizon AS (SELECT max(o_orderdate) AS h FROM orders),
    gaps AS (
      SELECT grp,
             datediff('day', o_orderdate,
                      COALESCE(lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                               (SELECT h FROM horizon))) AS gap_days,
             CASE WHEN lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) IS NULL
                  THEN 0 ELSE 1 END AS event
      FROM seg
    ),
    life AS (
      SELECT CAST(gap_days AS INTEGER) AS gap_days,
             CAST(SUM(CASE WHEN grp = 1 THEN event ELSE 0 END) AS BIGINT) AS d1,
             CAST(SUM(CASE WHEN grp = 1 THEN 1 - event ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN grp = 0 THEN event ELSE 0 END) AS BIGINT) AS d0,
             CAST(SUM(CASE WHEN grp = 0 THEN 1 - event ELSE 0 END) AS BIGINT) AS c0
      FROM gaps GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(d1 + c1) AS BIGINT) AS n1_tot,
                   CAST(SUM(d0 + c0) AS BIGINT) AS n0_tot FROM life),
    risk AS (
      SELECT gap_days, d1, d0,
             n1_tot - COALESCE(CAST(SUM(d1 + c1) OVER (ORDER BY gap_days ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS r1,
             n0_tot - COALESCE(CAST(SUM(d0 + c0) OVER (ORDER BY gap_days ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS r0,
             n1_tot, n0_tot
      FROM life CROSS JOIN tot
    ),
    terms AS (
      SELECT n1_tot, n0_tot, d1, d1 + d0 AS d, r1, r1 + r0 AS n
      FROM risk WHERE d1 + d0 > 0
    ),
    sums AS (
      SELECT MAX(n1_tot) AS n1_total, MAX(n0_tot) AS n0_total,
             CAST(SUM(d1) AS BIGINT) AS o1,
             CAST(SUM(d) AS BIGINT) AS o_total,
             CAST(SUM(CAST(FLOOR(CAST(d AS DOUBLE) * CAST(r1 AS DOUBLE) / CAST(n AS DOUBLE)
                                  * 1000000000.0 + 0.5) AS DECIMAL(28,0))) AS DOUBLE)
               / 1000000000.0 AS e1_sum,
             CAST(SUM(CASE WHEN n > 1
                           THEN CAST(FLOOR(CAST(d AS DOUBLE) * (CAST(r1 AS DOUBLE) / CAST(n AS DOUBLE))
                                     * (CAST(1 AS DOUBLE) - CAST(r1 AS DOUBLE) / CAST(n AS DOUBLE))
                                     * (CAST(n - d AS DOUBLE) / CAST(n - 1 AS DOUBLE))
                                     * 1000000000.0 + 0.5) AS DECIMAL(28,0))
                           ELSE CAST(0 AS DECIMAL(28,0)) END) AS DOUBLE)
               / 1000000000.0 AS var_sum
      FROM terms
    )
    SELECT n1_total, n0_total, o1, o_total, e1_sum, var_sum,
           (CAST(o1 AS DOUBLE) - e1_sum) / sqrt(var_sum) AS z,
           ((CAST(o1 AS DOUBLE) - e1_sum) / sqrt(var_sum))
             * ((CAST(o1 AS DOUBLE) - e1_sum) / sqrt(var_sum)) AS chi2
    FROM sums
    """,
)
def stats_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test comparing inter-purchase survival between two
    customer strata (BUILDING segment vs the rest) — "does this
    segment churn faster?", answered with censoring handled correctly
    (a plain mean-gap comparison is biased by the open-ended last
    gaps; the log-rank statistic is the standard unbiased answer).

    At each event time: observed group-1 events d1 vs expected
    d·r1/n under H0, hypergeometric variance d·(r1/n)(1−r1/n)(n−d)/
    (n−1); Z = Σ(d1−e1)/√Σv. At-risk counts are exact integers from
    the same calendar-bounded life-table window as customer_survival_km
    (declared allowlist exemption); per-time e/v terms scale to
    integers via floor(x·1e9+0.5) — an IEEE chain identical on both
    engines, unlike a raw double→decimal CAST whose engine-specific
    rounding path flipped one term at sf0.1 — and sum exactly. The customer join
    shuffles on custkey — dimension-sized, the intended sort-merge
    shape."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    seg = o.join(
        c.select(
            F.col("c_custkey").alias("o_custkey"),
            F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("grp"),
        ),
        "o_custkey",
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    horizon = o.agg(F.max("o_orderdate").alias("h"))
    gaps = (
        seg.select("grp", "o_custkey", "o_orderdate", "o_orderkey", nxt.alias("nxt"))
        .crossJoin(F.broadcast(horizon))
        .select(
            "grp",
            F.datediff(
                F.coalesce(F.col("nxt"), F.col("h")).cast("date"),
                F.col("o_orderdate").cast("date"),
            ).alias("gap_days"),
            F.when(F.col("nxt").isNull(), 0).otherwise(1).alias("event"),
        )
    )
    life = gaps.groupBy(F.col("gap_days").cast("int").alias("gap_days")).agg(
        F.sum(F.when(F.col("grp") == 1, F.col("event")).otherwise(0)).cast("long").alias("d1"),
        F.sum(F.when(F.col("grp") == 1, 1 - F.col("event")).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(F.col("grp") == 0, F.col("event")).otherwise(0)).cast("long").alias("d0"),
        F.sum(F.when(F.col("grp") == 0, 1 - F.col("event")).otherwise(0)).cast("long").alias("c0"),
    )
    tot = life.agg(
        F.sum(F.col("d1") + F.col("c1")).cast("long").alias("n1_tot"),
        F.sum(F.col("d0") + F.col("c0")).cast("long").alias("n0_tot"),
    )
    wd = Window.orderBy("gap_days").rowsBetween(Window.unboundedPreceding, -1)
    prior1 = F.coalesce(F.sum(F.col("d1") + F.col("c1")).over(wd).cast("long"), F.lit(0).cast("long"))
    prior0 = F.coalesce(F.sum(F.col("d0") + F.col("c0")).over(wd).cast("long"), F.lit(0).cast("long"))
    risk = life.crossJoin(F.broadcast(tot)).select(
        "gap_days", "d1", "d0", "n1_tot", "n0_tot",
        (F.col("n1_tot") - prior1).alias("r1"),
        (F.col("n0_tot") - prior0).alias("r0"),
    )
    terms = risk.where(F.col("d1") + F.col("d0") > 0).select(
        "n1_tot", "n0_tot", "d1", "r1",
        (F.col("d1") + F.col("d0")).alias("d"),
        (F.col("r1") + F.col("r0")).alias("n"),
    )
    dd = F.col("d").cast("double")
    r1d = F.col("r1").cast("double")
    nd = F.col("n").cast("double")
    p1 = r1d / nd

    # scale-9 rounding done EXPLICITLY in IEEE arithmetic: a plain
    # CAST(double AS DECIMAL(20,9)) takes engine-specific paths (Spark
    # converts exactly via BigDecimal; DuckDB multiplies in floats),
    # which disagree when x·1e9 lands within float error of a rounding
    # boundary — one term of ~1000 flipped at sf0.1. floor(x·1e9+0.5)
    # is the same IEEE chain on both engines, so the scaled integers
    # are bit-identical; they sum exactly as DECIMAL(28,0) and divide
    # back once at the end.
    def _scaled9(col):
        return F.floor(
            col * F.lit(1e9).cast("double") + F.lit(0.5).cast("double")
        ).cast("decimal(28,0)")

    e1 = _scaled9(dd * p1)
    v = F.when(
        F.col("n") > 1,
        _scaled9(
            dd * p1 * (F.lit(1).cast("double") - p1)
            * ((F.col("n") - F.col("d")).cast("double") / (F.col("n") - 1).cast("double"))
        ),
    ).otherwise(F.lit(0).cast("decimal(28,0)"))
    back = F.lit(1e9).cast("double")
    sums = terms.agg(
        F.max("n1_tot").alias("n1_total"),
        F.max("n0_tot").alias("n0_total"),
        F.sum("d1").cast("long").alias("o1"),
        F.sum("d").cast("long").alias("o_total"),
        (F.sum(e1).cast("double") / back).alias("e1_sum"),
        (F.sum(v).cast("double") / back).alias("var_sum"),
    )
    z = (F.col("o1").cast("double") - F.col("e1_sum")) / F.sqrt(F.col("var_sum"))
    return sums.select(
        "n1_total", "n0_total", "o1", "o_total", "e1_sum", "var_sum",
        z.alias("z"), (z * z).alias("chi2"),
    )


# ---------------------------------------------------------------------
# funnel time-to-convert distribution
# ---------------------------------------------------------------------


@register(
    "funnel_time_to_convert",
    """
    WITH s AS (
      SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t_signup
      FROM events WHERE event_type = 'signup' AND user_id IS NOT NULL GROUP BY 1
    ),
    conv AS (
      SELECT s.user_id,
             CAST(datediff('second', s.t_signup, min(CAST(e.ts AS TIMESTAMP))) AS BIGINT) AS delta_s
      FROM s JOIN events e
        ON e.user_id = s.user_id AND e.event_type = 'purchase'
       AND CAST(e.ts AS TIMESTAMP) >= s.t_signup
      GROUP BY s.user_id, s.t_signup
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM s) AS n_signup_users,
           CAST(count(*) AS BIGINT) AS n_converted,
           CAST(count(*) AS DOUBLE)
             / NULLIF((SELECT CAST(count(*) AS DOUBLE) FROM s), 0) AS conversion_rate,
           CAST(min(delta_s) AS BIGINT) AS min_seconds,
           quantile_cont(delta_s, 0.5) AS median_seconds,
           quantile_cont(delta_s, 0.9) AS p90_seconds,
           CAST(max(delta_s) AS BIGINT) AS max_seconds,
           CAST(CAST(SUM(CAST(delta_s AS DECIMAL(27,0))) AS VARCHAR) AS DOUBLE)
             / NULLIF(CAST(count(*) AS DOUBLE), 0) AS mean_seconds
    FROM conv
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution for the signup→purchase funnel:
    per user, seconds from FIRST signup to the first purchase at or
    after it (a purchase before signup never counts — the funnel is
    ordered), summarized as conversion rate + min/median/p90/max/mean.
    Complements funnel_conversion (who converts) with HOW FAST.

    Both sides truncate to whole seconds (Spark's timestamp→long cast
    ≡ DuckDB datediff('second')); the mean folds through an exact
    DECIMAL sum; median/p90 are exact interpolated percentiles
    (identical arithmetic both engines — the percentile_exact
    contract). Scale: two user_id hash-aggs + one user_id join, all
    one shuffle key; the quantile is over |converted users| values,
    with the mergeable value-histogram walk as the documented huge-N
    scale twin (events_mergeable_quantile_rollup)."""
    e = load_table(spark, sf_dir, "events")
    s = (
        e.where((F.col("event_type") == "signup") & F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    conv = (
        e.where(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .where(F.col("ts") >= F.col("t_signup"))
        .groupBy("user_id", "t_signup")
        .agg(F.min("ts").alias("t_purchase"))
        .select(
            (
                F.col("t_purchase").cast("long") - F.col("t_signup").cast("long")
            ).alias("delta_s")
        )
    )
    n_signups = s.agg(F.count(F.lit(1)).alias("n_signup_users"))
    agg = conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("delta_s").cast("long").alias("min_seconds"),
        F.percentile("delta_s", F.lit(0.5)).alias("median_seconds"),
        F.percentile("delta_s", F.lit(0.9)).alias("p90_seconds"),
        F.max("delta_s").cast("long").alias("max_seconds"),
        F.sum(F.col("delta_s").cast("decimal(27,0)"))
        .cast("string")
        .cast("double")
        .alias("sum_s"),
    )
    # NULLIF pins the zero-traffic corpus (no signups / no conversions)
    # to NULL on both engines — Spark ANSI would throw DIVIDE_BY_ZERO
    # while DuckDB returns NaN (r13 empty-corpus sweep find)
    return agg.crossJoin(F.broadcast(n_signups)).select(
        "n_signup_users",
        "n_converted",
        (
            F.col("n_converted").cast("double")
            / F.nullif(F.col("n_signup_users").cast("double"), F.lit(0.0))
        ).alias("conversion_rate"),
        "min_seconds", "median_seconds", "p90_seconds", "max_seconds",
        (
            F.col("sum_s")
            / F.nullif(F.col("n_converted").cast("double"), F.lit(0.0))
        ).alias("mean_seconds"),
    )


# ---------------------------------------------------------------------
# HLL segment-overlap estimate
# ---------------------------------------------------------------------


@register("events_segment_overlap_hll", None)  # Spark HLL binary: no DuckDB twin
def events_segment_overlap_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation from mergeable sketches: distinct
    users who click, who purchase, their union (one hll_union), and
    the inclusion-exclusion intersection estimate |A∩B| ≈ |A|+|B|−|A∪B|
    with the derived Jaccard — the segment-overlap question answered
    WITHOUT a distinct-join, from sketches that can be rolled up
    incrementally (same states as events_hll_rolling_users). Rows-only
    for the driver; the ≤5% error vs exact countDistinct and the
    identity est_a + est_b = est_union + est_inter are pinned in
    tests/test_stattests.py."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    sk = e.agg(
        F.expr("hll_sketch_agg(user_id) FILTER (WHERE event_type = 'click')").alias("sk_a"),
        F.expr("hll_sketch_agg(user_id) FILTER (WHERE event_type = 'purchase')").alias("sk_b"),
    )
    est = sk.select(
        F.hll_sketch_estimate("sk_a").alias("est_click"),
        F.hll_sketch_estimate("sk_b").alias("est_purchase"),
        F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b")).alias("est_union"),
    )
    inter = (
        F.col("est_click") + F.col("est_purchase") - F.col("est_union")
    ).alias("est_intersection")
    # NULLIF: an empty union sketch (zero-traffic corpus) pins jaccard
    # to NULL instead of an ANSI DIVIDE_BY_ZERO (r13 empty-corpus find)
    return est.select(
        "est_click", "est_purchase", "est_union", inter,
        (
            (F.col("est_click") + F.col("est_purchase") - F.col("est_union")).cast("double")
            / F.nullif(F.col("est_union").cast("double"), F.lit(0.0))
        ).alias("jaccard_est"),
    )


# ---------------------------------------------------------------------
# two-proportion z-test with Wilson intervals
# ---------------------------------------------------------------------

_Z95 = 1.959963984540054  # Phi^-1(0.975), shared literal on both plans


def _wilson_sql(x: str, n: str) -> str:
    """Wilson 95% score interval as identical SQL text on both engines:
    (p + z²/2n ± z·sqrt(p(1−p)/n + z²/4n²)) / (1 + z²/n)."""
    p = f"(CAST({x} AS DOUBLE) / CAST({n} AS DOUBLE))"
    z2n = f"(CAST({_Z95!r} AS DOUBLE) * CAST({_Z95!r} AS DOUBLE) / CAST({n} AS DOUBLE))"
    half = (
        f"(CAST({_Z95!r} AS DOUBLE) * sqrt({p} * (CAST(1 AS DOUBLE) - {p}) / CAST({n} AS DOUBLE)"
        f" + {z2n} / (CAST(4 AS DOUBLE) * CAST({n} AS DOUBLE))))"
    )
    lo = f"(({p} + {z2n} / CAST(2 AS DOUBLE) - {half}) / (CAST(1 AS DOUBLE) + {z2n}))"
    hi = f"(({p} + {z2n} / CAST(2 AS DOUBLE) + {half}) / (CAST(1 AS DOUBLE) + {z2n}))"
    return lo, hi


def _wilson_col(x, n):
    z = F.lit(_Z95).cast("double")
    p = x.cast("double") / n.cast("double")
    z2n = z * z / n.cast("double")
    half = z * F.sqrt(
        p * (F.lit(1).cast("double") - p) / n.cast("double")
        + z2n / (F.lit(4).cast("double") * n.cast("double"))
    )
    denom = F.lit(1).cast("double") + z2n
    return (
        (p + z2n / F.lit(2).cast("double") - half) / denom,
        (p + z2n / F.lit(2).cast("double") + half) / denom,
    )


# call-site NULLIF (not in the helper: events_wilson_ci's n is a
# nonzero count by construction and its plan must not change): an
# empty arm NULLs the whole interval on both engines (r14 sweep find)
_AB_LO_A, _AB_HI_A = _wilson_sql("x_a", "NULLIF(n_a, 0)")
_AB_LO_B, _AB_HI_B = _wilson_sql("x_b", "NULLIF(n_b, 0)")


@register(
    "events_ab_proportion_ztest",
    f"""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS variant,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
                  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS converted
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    wide AS (
      SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT) AS x_a,
             CAST(SUM(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT) AS x_b
      FROM per_user
    )
    SELECT n_a, n_b, x_a, x_b,
           CAST(x_a AS DOUBLE) / NULLIF(CAST(n_a AS DOUBLE), 0) AS p_a,
           CAST(x_b AS DOUBLE) / NULLIF(CAST(n_b AS DOUBLE), 0) AS p_b,
           CASE WHEN n_a = 0 OR n_b = 0 OR x_a + x_b = 0 OR x_a + x_b = n_a + n_b THEN CAST(NULL AS DOUBLE)
                ELSE (CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                  / sqrt((CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                         * (CAST(1 AS DOUBLE) - CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                         * (CAST(1 AS DOUBLE) / CAST(n_a AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(n_b AS DOUBLE))) END AS z,
           {_AB_LO_A} AS ci_a_lo, {_AB_HI_A} AS ci_a_hi,
           {_AB_LO_B} AS ci_b_lo, {_AB_HI_B} AS ci_b_hi,
           {_AB_HI_A} < {_AB_LO_B} OR {_AB_HI_B} < {_AB_LO_A} AS ci_disjoint
    FROM wide
    """,
)
def events_ab_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on CONVERSION between hash-assigned
    experiment arms — the rates sibling of events_ab_ttest's means
    test (most experiment metrics are conversions, not continuous):
    pooled-variance z plus per-arm Wilson 95% score intervals (the
    small-n/extreme-p-correct interval — a normal interval can leave
    [0,1]; Wilson cannot, which the test pins). One per-user hash agg
    (converted = MAX over the user's rows — partial-aggregatable),
    one 1-row fold; every float after the integer counts is a shared
    fixed IEEE chain, including the z² literal."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    per_user = e.groupBy(
        "user_id", (F.col("user_id") % 2).alias("variant")
    ).agg(
        F.when(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) >= 14,
            F.lit(1).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("converted")
    )
    wide = per_user.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted")).otherwise(0)).cast("long").alias("x_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("converted")).otherwise(0)).cast("long").alias("x_b"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    xa, xb = F.col("x_a"), F.col("x_b")
    # NULLIF pins the one-empty-arm corpus (a single-user stream) to
    # NULL on both engines — the r14 sweep find (Spark ANSI raised,
    # DuckDB yielded inf); the z CASE additionally short-circuits so
    # the pooled-variance chain never divides by an empty arm
    nad = F.nullif(na.cast("double"), F.lit(0.0))
    nbd = F.nullif(nb.cast("double"), F.lit(0.0))
    pa = xa.cast("double") / nad
    pb = xb.cast("double") / nbd
    pool = (xa + xb).cast("double") / (na + nb).cast("double")
    z = F.when(
        (na == 0)
        | (nb == 0)
        | ((xa + xb) == 0)
        | ((xa + xb) == (na + nb)),
        F.lit(None).cast("double"),
    ).otherwise(
        (pa - pb)
        / F.sqrt(
            pool
            * (F.lit(1).cast("double") - pool)
            * (
                F.lit(1).cast("double") / nad
                + F.lit(1).cast("double") / nbd
            )
        )
    )
    lo_a, hi_a = _wilson_col(xa, F.nullif(na, F.lit(0)))
    lo_b, hi_b = _wilson_col(xb, F.nullif(nb, F.lit(0)))
    return wide.select(
        "n_a", "n_b", "x_a", "x_b",
        pa.alias("p_a"), pb.alias("p_b"), z.alias("z"),
        lo_a.alias("ci_a_lo"), hi_a.alias("ci_a_hi"),
        lo_b.alias("ci_b_lo"), hi_b.alias("ci_b_hi"),
        ((hi_a < lo_b) | (hi_b < lo_a)).alias("ci_disjoint"),
    )


# ---------------------------------------------------------------------
# seasonal-residual anomaly detection (decompose ∘ robust-z)
# ---------------------------------------------------------------------


@register(
    "events_seasonal_residual_anomalies",
    f"""
    WITH daily AS (
      SELECT event_type, CAST({_TS} AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    win AS (
      SELECT event_type, day, n,
             SUM(n) OVER w AS sum7, COUNT(*) OVER w AS cnt7
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    full_win AS (
      SELECT event_type, day, n,
             CAST((day - DATE '1970-01-05') % 7 AS BIGINT) AS weekday,
             sum7, CAST(7 * n - sum7 AS BIGINT) AS detr7
      FROM win WHERE cnt7 = 7
    ),
    seasonal AS (
      SELECT event_type, weekday,
             CAST(SUM(detr7) AS DOUBLE) / CAST(7 * COUNT(*) AS DOUBLE) AS seasonal
      FROM full_win GROUP BY 1, 2
    ),
    resid AS (
      SELECT f.event_type, f.day, CAST(f.n AS BIGINT) AS n,
             (CAST(f.n AS DOUBLE) - CAST(f.sum7 AS DOUBLE) / CAST(7 AS DOUBLE)) - s.seasonal
               AS remainder
      FROM full_win f JOIN seasonal s
        ON f.event_type = s.event_type AND f.weekday = s.weekday
    ),
    med AS (
      SELECT event_type, quantile_cont(remainder, 0.5) AS med
      FROM resid GROUP BY 1
    ),
    mad AS (
      SELECT r.event_type, quantile_cont(abs(r.remainder - m.med), 0.5) AS mad
      FROM resid r JOIN med m USING (event_type) GROUP BY 1
    )
    SELECT r.event_type, r.day, r.n, r.remainder,
           CAST(0.6745 AS DOUBLE) * (r.remainder - m.med) / d.mad AS rz,
           abs(CAST(0.6745 AS DOUBLE) * (r.remainder - m.med) / d.mad) > CAST(3.5 AS DOUBLE) AS is_anomaly
    FROM resid r JOIN med m USING (event_type) JOIN mad d USING (event_type)
    WHERE d.mad > 0
    """,
)
def events_seasonal_residual_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly detection — the composition the two
    pieces exist for: classical decomposition strips trend + weekday
    seasonality (events_trend_seasonal_decompose), then the robust
    median/MAD z-score (stats_robust_zscore's machinery) flags days
    whose RESIDUAL is extreme. A plain z-score over raw counts calls
    every Friday an anomaly on a weekday-heavy stream and misses a
    quiet-day spike; the residual test sees both.

    Every remainder is a fixed IEEE chain over integer sums (the
    decompose contract), so both engines feed IDENTICAL doubles into
    the same interpolated-percentile arithmetic — the hash matches end
    to end. Zero-MAD groups (perfectly regular series) are excluded
    on both engines. Scale: daily rollup shuffle + per-type
    calendar-bounded windows + two tiny percentile frames per type."""
    from .queries_analytics import events_trend_seasonal_decompose

    # persist the calendar-bounded decomposition (|types| x |days|
    # rows): three consumers (rows, median, MAD) would otherwise each
    # re-run the decompose subtree — 8 events scans cold (the
    # repeated-scan class caught by the cold scan-budget sweep)
    dec = events_trend_seasonal_decompose(spark, sf_dir).select(
        "event_type", "day", "n", "remainder"
    ).persist()
    med = dec.groupBy("event_type").agg(
        F.percentile("remainder", F.lit(0.5)).alias("med")
    )
    j1 = dec.join(med, "event_type")
    mad = j1.groupBy("event_type").agg(
        F.percentile(F.abs(F.col("remainder") - F.col("med")), F.lit(0.5)).alias("mad")
    )
    rz = (
        F.lit(0.6745).cast("double")
        * (F.col("remainder") - F.col("med"))
        / F.col("mad")
    )
    return (
        j1.join(mad, "event_type")
        .where(F.col("mad") > 0)
        .select(
            "event_type", "day", "n", "remainder",
            rz.alias("rz"),
            (F.abs(rz) > F.lit(3.5).cast("double")).alias("is_anomaly"),
        )
    )


# ---------------------------------------------------------------------
# ECDF quantile transform (feature normalization)
# ---------------------------------------------------------------------


@register(
    "ml_quantile_transform",
    """
    WITH vals AS (
      SELECT value, CAST(count(*) AS BIGINT) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY value
    ),
    cum AS (
      SELECT value, n,
             CAST(SUM(n) OVER (ORDER BY value) AS BIGINT) AS c,
             (SELECT CAST(SUM(n) AS BIGINT) FROM vals) AS total
      FROM vals
    )
    SELECT value, n,
           CAST(c AS DOUBLE) / CAST(total AS DOUBLE) AS ecdf,
           CAST(2 * (c - n) + n + 1 AS DOUBLE) / CAST(2 * total AS DOUBLE) AS q_mid
    FROM cum
    """,
)
def ml_quantile_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile (rank-gaussianization-ready) feature transform: maps
    each purchase value to its ECDF position — the preprocessing that
    makes heavy-tailed monetary features uniform before model
    training. Two variants per distinct value: right-continuous
    ECDF = cum/N, and the midrank ECDF (2·cum_before + t + 1)/(2N),
    the tie-correct version whose numerator stays an exact integer
    (the Mann-Whitney average-rank identity).

    Scale: one hash-agg to |distinct values|, then the two-pass
    distributed cumsum (no unpartitioned data window); emitting the
    value→quantile MAPPING (not per-row output) keeps the result
    |distinct values|-sized — applying it to the stream is a map-side
    join downstream."""
    e = load_table(spark, sf_dir, "events")
    vals = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cum = with_global_cumsum(vals, [("value", "asc")], [], "n")
    c, n, total = F.col("cum_sum").cast("long"), F.col("n"), F.col("total_sum").cast("long")
    return cum.select(
        "value",
        n.alias("n"),
        (c.cast("double") / total.cast("double")).alias("ecdf"),
        (
            (F.lit(2) * (c - n) + n + F.lit(1)).cast("double")
            / (F.lit(2) * total).cast("double")
        ).alias("q_mid"),
    )


# ---------------------------------------------------------------------
# Poissonized bootstrap CI (distribution-free, fully distributed)
# ---------------------------------------------------------------------

_BOOT_B = 100  # resamples; CI order statistics below assume this
# Poisson(1) CDF literals (Python-computed; both engines compare the
# same repr-exact doubles) — inverse-CDF from one md5-uniform draw.
# P(w ≥ 8) ≈ 1e-5 is folded into the top bucket.
_POIS_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
    "0.999916758850712",
)


def _pois_w_sql(u: str) -> str:
    """Inverse Poisson(1) CDF: uniform → multiplicity (SQL, shared
    verbatim by both engines)."""
    cases = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS_CDF)
    )
    return f"(CASE {cases} ELSE 7 END)"


@register(
    "stats_bootstrap_mean_ci",
    f"""
    WITH drawn AS (
      SELECT b.b, o.o_totalprice,
             {_pois_w_sql(
                 "(('0x' || substr(md5(b.b || ':' || o.o_orderkey), 1, 15))::BIGINT"
                 " / CAST(1152921504606846976 AS DOUBLE))"
             )} AS w
      FROM orders o
      CROSS JOIN (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS b) b
    ),
    rs AS (
      SELECT b,
             CAST(SUM(w) AS BIGINT) AS n_eff,
             SUM(CAST(w AS DECIMAL(2,0)) * CAST(o_totalprice AS DECIMAL(18,2))) AS s_dec
      FROM drawn WHERE w > 0 GROUP BY b
    ),
    means AS (
      SELECT b, CAST(s_dec AS DOUBLE) / CAST(n_eff AS DOUBLE) AS m FROM rs
    ),
    point AS (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS point_mean
      FROM orders
    )
    SELECT CAST(count(*) AS BIGINT) AS n_resamples,
           p.point_mean,
           (list_sort(list(m)))[3] AS ci_lo,
           (list_sort(list(m)))[98] AS ci_hi
    FROM means CROSS JOIN point p
    GROUP BY p.point_mean
    """,
)
def stats_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free 95% bootstrap CI for the mean order value via
    the POISSONIZED bootstrap (each row's per-resample multiplicity ~
    Poisson(1) — the distributed approximation to multinomial
    resampling used when rows can't be globally indexed; Chamandy et
    al. 2012, "Estimating uncertainty for massive data streams").

    Determinism/parity: the multiplicity comes from an inverse-CDF
    lookup on a 60-bit md5 uniform (both engines compute the same
    digest, the same IEEE division by 2⁶⁰, and compare against the
    same Python-literal CDF thresholds); per-resample sums fold in
    exact DECIMAL; each mean is ONE IEEE division; the CI bounds are
    DISCRETE order statistics (3rd / 98th of the B = 100 sorted means
    — sorted inside a single bounded collect, no global window).

    Scale: the 100× row expansion is map-side CPU (explode + hash +
    CASE — swap md5 for xxhash64 in production, same plan); the only
    shuffle is the partial-aggregated groupBy(b) carrying ≤ B rows
    per map task, and the final stats ride a 100-row frame. Cost is
    B × one scan regardless of cluster size — the bootstrap's
    inherent price, all embarrassingly parallel. The source is
    repartitioned first (``parallelize``): the B× explode inherits
    the scan's split count, and the driver fixture is a single small
    parquet file (one split) — unrepartitioned, 15M hash evaluations
    ran on one task (measured 39 s at sf0.1 vs 2.9 s repartitioned)."""
    from ..io import parallelize

    o = parallelize(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    )
    u = (
        "(CAST(conv(substring(md5(concat(CAST(b AS STRING), ':', "
        "CAST(o_orderkey AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        " / CAST(1152921504606846976 AS DOUBLE))"
    )
    drawn = o.select(
        "o_totalprice",
        F.expr(f"explode(sequence(0, {_BOOT_B - 1})) AS b"),
        "o_orderkey",
    ).select(
        "b",
        "o_totalprice",
        F.expr(_pois_w_sql(u)).alias("w"),
    )
    rs = (
        drawn.where(F.col("w") > 0)
        .groupBy("b")
        .agg(
            F.sum("w").cast("long").alias("n_eff"),
            F.sum(
                F.col("w").cast("decimal(2,0)")
                * F.col("o_totalprice").cast("decimal(18,2)")
            ).alias("s_dec"),
        )
    )
    means = rs.select(
        "b",
        (F.col("s_dec").cast("double") / F.col("n_eff").cast("double")).alias("m"),
    )
    point = o.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("point_mean")
    )
    return (
        means.crossJoin(F.broadcast(point))
        .groupBy("point_mean")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_resamples"),
            F.expr("sort_array(collect_list(m))[2]").alias("ci_lo"),
            F.expr("sort_array(collect_list(m))[97]").alias("ci_hi"),
        )
        .select("n_resamples", "point_mean", "ci_lo", "ci_hi")
    )


@register(
    "stats_theil_sen",
    f"""
    WITH daily AS (
      SELECT event_type, CAST({_TS} AS DATE) AS day, COUNT(*) AS y
      FROM events GROUP BY 1, 2
    ),
    slopes AS (
      SELECT a.event_type,
             CAST(b.y - a.y AS DOUBLE)
               / CAST(b.day - a.day AS DOUBLE) AS slope
      FROM daily a
      JOIN daily b ON b.event_type = a.event_type AND b.day > a.day
    ),
    ranked AS (
      SELECT event_type, slope,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
      FROM slopes
    )
    SELECT event_type, CAST(MAX(n_pairs) AS BIGINT) AS n_pairs,
           (MIN(CASE WHEN rn = (n_pairs + 1) // 2 THEN slope END)
            + MIN(CASE WHEN rn = n_pairs // 2 + 1 THEN slope END)) / 2.0
             AS theil_sen_slope
    FROM ranked GROUP BY event_type
    """,
)
def stats_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type over the daily count
    series: the median of all pairwise slopes — the estimator that
    shrugs off outlier days where OLS (stats_groupwise_ols) gets
    dragged. Pairs are day-bounded (groups of ~60 days → ~1.8k pairs,
    a CONSTANT per key regardless of row count, since the daily
    aggregation collapses the data first — the scale story). Each
    slope is one IEEE division of exact integers; the median is
    selection plus (lo+hi)/2, which for odd counts reduces to the
    exact middle value ((v+v)/2 = v in IEEE), so both engines
    hash-match bit-for-bit."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    a, b = daily.alias("a"), daily.alias("b")
    slopes = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.day") > F.col("a.day")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            (
                (F.col("b.y") - F.col("a.y")).cast("double")
                / F.datediff(F.col("b.day"), F.col("a.day")).cast("double")
            ).alias("slope"),
        )
    )
    w = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(w.orderBy("slope")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_pairs"),
    )
    lo = F.expr("(n_pairs + 1) DIV 2")
    hi = F.expr("n_pairs DIV 2 + 1")
    return ranked.groupBy("event_type").agg(
        F.max("n_pairs").cast("long").alias("n_pairs"),
        (
            (
                F.min(F.when(F.col("rn") == lo, F.col("slope")))
                + F.min(F.when(F.col("rn") == hi, F.col("slope")))
            )
            / F.lit(2.0)
        ).alias("theil_sen_slope"),
    )


@register(
    "stats_kendall_tau",
    f"""
    WITH daily AS (
      SELECT event_type, CAST({_TS} AS DATE) AS day, COUNT(*) AS y
      FROM events GROUP BY 1, 2
    ),
    paired AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.day, a.y AS ya, b.y AS yb
      FROM daily a
      JOIN daily b ON b.day = a.day AND b.event_type > a.event_type
    ),
    conc AS (
      SELECT p.type_a, p.type_b,
             COUNT(*) AS n_pairs,
             SUM(CASE WHEN (q.ya - p.ya) * (q.yb - p.yb) > 0
                      THEN 1 ELSE 0 END) AS concordant,
             SUM(CASE WHEN (q.ya - p.ya) * (q.yb - p.yb) < 0
                      THEN 1 ELSE 0 END) AS discordant
      FROM paired p
      JOIN paired q ON q.type_a = p.type_a AND q.type_b = p.type_b
                   AND q.day > p.day
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(concordant AS BIGINT) AS concordant,
           CAST(discordant AS BIGINT) AS discordant,
           CAST(concordant - discordant AS DOUBLE)
             / CAST(n_pairs AS DOUBLE) AS tau_a
    FROM conc
    """,
)
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall rank correlation (tau-a) between every pair of event
    types' daily count series — the nonparametric dependence measure
    next to the Pearson entry (agg_correlation_from_sums): count
    concordant vs discordant day pairs; ties contribute to neither.
    Everything is integer arithmetic until ONE final division, so the
    hash oracle is exact. Scale: the daily collapse bounds the
    day-pair join to a constant per type pair (~days²/2) at any row
    count — same shape as stats_theil_sen."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    a, b = daily.alias("a"), daily.alias("b")
    paired = a.join(
        b,
        (F.col("b.day") == F.col("a.day"))
        & (F.col("b.event_type") > F.col("a.event_type")),
    ).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.day").alias("day"),
        F.col("a.y").alias("ya"),
        F.col("b.y").alias("yb"),
    )
    p, q = paired.alias("p"), paired.alias("q")
    sign = (F.col("q.ya") - F.col("p.ya")) * (F.col("q.yb") - F.col("p.yb"))
    conc = (
        p.join(
            q,
            (F.col("q.type_a") == F.col("p.type_a"))
            & (F.col("q.type_b") == F.col("p.type_b"))
            & (F.col("q.day") > F.col("p.day")),
        )
        .groupBy(F.col("p.type_a").alias("type_a"), F.col("p.type_b").alias("type_b"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.when(sign > 0, 1).otherwise(0)).alias("concordant"),
            F.sum(F.when(sign < 0, 1).otherwise(0)).alias("discordant"),
        )
    )
    return conc.select(
        "type_a",
        "type_b",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("concordant").cast("long").alias("concordant"),
        F.col("discordant").cast("long").alias("discordant"),
        (
            (F.col("concordant") - F.col("discordant")).cast("double")
            / F.col("n_pairs").cast("double")
        ).alias("tau_a"),
    )


@register(
    "events_autocorrelation",
    f"""
    WITH daily AS (
      SELECT event_type, CAST({_TS} AS DATE) AS day, COUNT(*) AS y
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, COUNT(*) AS n, SUM(y) AS s, SUM(y * y) AS q
      FROM daily GROUP BY event_type
    ),
    lags AS (SELECT unnest(generate_series(1, 7)) AS lag),
    pairs AS (
      SELECT a.event_type, l.lag,
             COUNT(*) AS m,
             SUM(a.y * b.y) AS p,
             SUM(a.y) AS ah,
             SUM(b.y) AS bt
      FROM daily a
      CROSS JOIN lags l
      JOIN daily b ON b.event_type = a.event_type
                  AND b.day = a.day + CAST(l.lag AS INTEGER) * INTERVAL 1 DAY
      GROUP BY 1, 2
    )
    SELECT p.event_type, CAST(p.lag AS INTEGER) AS lag,
           CAST(s.n AS BIGINT) AS n_days, CAST(p.m AS BIGINT) AS n_pairs,
           CAST(s.n * s.n * p.p - s.n * s.s * (p.ah + p.bt) + p.m * s.s * s.s
                AS DOUBLE)
             / CAST(s.n * s.n * s.q - s.n * s.s * s.s AS DOUBLE) AS acf
    FROM pairs p JOIN stats s ON s.event_type = p.event_type
    """,
)
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelation of each event type's daily count
    series — the seasonality detector feeding the decompose/forecast
    entries (a weekly cycle shows as an acf spike at lag 7). The
    mean-centered products are expanded algebraically so EVERYTHING is
    integer sums until one final division (the from-sums discipline of
    agg_correlation_from_sums): acf = (n²P − nS(A+B) + mS²) /
    (n²Q − nS²) with P, A, B per lag from a calendar lag join (missing
    days drop out identically on both engines). Daily collapse first →
    the lag join is a bounded constant per type at any row count."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("q"),
    )
    lags = daily.sparkSession.range(1, 8).select(
        F.col("id").cast("int").alias("lag")
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.day") == F.date_add(F.col("a.day"), F.col("lag"))),
        )
        .groupBy(F.col("a.event_type").alias("event_type"), "lag")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.sum(F.col("a.y") * F.col("b.y")).alias("p"),
            F.sum(F.col("a.y")).alias("ah"),
            F.sum(F.col("b.y")).alias("bt"),
        )
    )
    j = pairs.join(stats, "event_type")
    num = (
        F.col("n") * F.col("n") * F.col("p")
        - F.col("n") * F.col("s") * (F.col("ah") + F.col("bt"))
        + F.col("m") * F.col("s") * F.col("s")
    )
    den = F.col("n") * F.col("n") * F.col("q") - F.col("n") * F.col("s") * F.col("s")
    return j.select(
        "event_type",
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("long").alias("n_days"),
        F.col("m").cast("long").alias("n_pairs"),
        (num.cast("double") / den.cast("double")).alias("acf"),
    )


@register(
    "stats_spearman_rho",
    f"""
    WITH daily AS (
      SELECT event_type, CAST({_TS} AS DATE) AS day, COUNT(*) AS y
      FROM events GROUP BY 1, 2
    ),
    paired AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.day, a.y AS ya, b.y AS yb
      FROM daily a
      JOIN daily b ON b.day = a.day AND b.event_type > a.event_type
    ),
    ranked AS (
      SELECT type_a, type_b,
             2 * RANK() OVER (PARTITION BY type_a, type_b ORDER BY ya)
               + COUNT(*) OVER (PARTITION BY type_a, type_b, ya) - 1 AS rx2,
             2 * RANK() OVER (PARTITION BY type_a, type_b ORDER BY yb)
               + COUNT(*) OVER (PARTITION BY type_a, type_b, yb) - 1 AS ry2
      FROM paired
    ),
    sums AS (
      SELECT type_a, type_b, COUNT(*) AS n,
             SUM(rx2) AS sx, SUM(ry2) AS sy,
             SUM(rx2 * rx2) AS sxx, SUM(ry2 * ry2) AS syy,
             SUM(rx2 * ry2) AS sxy
      FROM ranked GROUP BY 1, 2
    )
    SELECT type_a, type_b, CAST(n AS BIGINT) AS n_days,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 0) AS spearman_rho
    FROM sums
    """,
)
def stats_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between every event-type pair's daily
    series — completes the correlation trio (Pearson-from-sums /
    Kendall / Spearman). Tie-correct average ranks stay INTEGER by
    carrying 2·avg-rank = 2·rank + |ties| − 1 (Pearson is affine-
    invariant, so the doubling cancels); everything is integer sums
    until one final chain whose only non-arithmetic op is sqrt —
    IEEE-correctly-rounded, hence bit-equal cross-engine. Day-pair
    frame bounded after the daily collapse, windows partitioned per
    type pair."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    a, b = daily.alias("a"), daily.alias("b")
    paired = a.join(
        b,
        (F.col("b.day") == F.col("a.day"))
        & (F.col("b.event_type") > F.col("a.event_type")),
    ).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.y").alias("ya"),
        F.col("b.y").alias("yb"),
    )
    pw = Window.partitionBy("type_a", "type_b")
    ranked = paired.select(
        "type_a",
        "type_b",
        (
            F.lit(2) * F.rank().over(pw.orderBy("ya"))
            + F.count(F.lit(1)).over(
                Window.partitionBy("type_a", "type_b", "ya")
            )
            - F.lit(1)
        ).alias("rx2"),
        (
            F.lit(2) * F.rank().over(pw.orderBy("yb"))
            + F.count(F.lit(1)).over(
                Window.partitionBy("type_a", "type_b", "yb")
            )
            - F.lit(1)
        ).alias("ry2"),
    )
    sums = ranked.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx2").alias("sx"),
        F.sum("ry2").alias("sy"),
        F.sum(F.col("rx2") * F.col("rx2")).alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).alias("syy"),
        F.sum(F.col("rx2") * F.col("ry2")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den_a = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_b = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return sums.select(
        "type_a",
        "type_b",
        F.col("n").cast("long").alias("n_days"),
        # NULLIF: a constant rank series (single shared day, or a
        # tied-everywhere count) zeroes a rank variance — ρ is
        # undefined, NULL on both engines (the r14 sweep find)
        (
            num.cast("double")
            / F.nullif(
                F.sqrt(den_a.cast("double") * den_b.cast("double")),
                F.lit(0.0),
            )
        ).alias("spearman_rho"),
    )


# Shared formula TEXT for the power entry (Spark F.expr ≡ oracle SQL —
# both engines parse the byte-identical chain, the stump discipline).
# z constants are the repr() of Phi^-1(0.975) and Phi^-1(0.80): float
# LITERALS both engines parse to the same double — no erf() is ever
# evaluated in-engine.
_PWR_ZA = repr(1.959963984540054)
_PWR_ZB = repr(0.8416212335729143)
# NULLIF pins the one-empty-arm corpus (a single-user stream) to NULL
# on both engines — the r14 sweep find; the text is shared, so one
# edit guards both plans
_PWR_PA = "(CAST(x_a AS DOUBLE) / NULLIF(CAST(n_a AS DOUBLE), 0))"
_PWR_PB = "(CAST(x_b AS DOUBLE) / NULLIF(CAST(n_b AS DOUBLE), 0))"
_PWR_POOL = "(CAST(x_a + x_b AS DOUBLE) / NULLIF(CAST(n_a + n_b AS DOUBLE), 0))"
_PWR_NUM = (
    f"({_PWR_ZA} * sqrt(2.0 * {_PWR_POOL} * (1.0 - {_PWR_POOL}))"
    f" + {_PWR_ZB} * sqrt({_PWR_PA} * (1.0 - {_PWR_PA})"
    f" + {_PWR_PB} * (1.0 - {_PWR_PB})))"
)
_PWR_DELTA = f"({_PWR_PA} - {_PWR_PB})"
_PWR_REQ = (
    f"CASE WHEN {_PWR_DELTA} = 0.0 THEN CAST(NULL AS BIGINT) "
    f"ELSE CAST(CEIL({_PWR_NUM} * {_PWR_NUM}"
    f" / ({_PWR_DELTA} * {_PWR_DELTA})) AS BIGINT) END"
)


@register(
    "events_power_analysis",
    f"""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS variant,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
                  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS converted
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    wide AS (
      SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT) AS x_a,
             CAST(SUM(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT) AS x_b
      FROM per_user
    )
    SELECT n_a, n_b, x_a, x_b,
           {_PWR_PA} AS p_a, {_PWR_PB} AS p_b,
           {_PWR_DELTA} AS observed_delta,
           {_PWR_REQ} AS required_n_per_arm,
           CASE WHEN {_PWR_REQ} IS NULL THEN CAST(NULL AS BOOLEAN)
                ELSE LEAST(n_a, n_b) >= {_PWR_REQ} END AS adequately_powered
    FROM wide
    """,
)
def events_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-size adequacy for the running experiment (the planning
    sibling of events_ab_proportion_ztest, SAME per-user arms): the
    per-arm n required to detect the OBSERVED rate delta at two-sided
    α=0.05 with 80% power (classic two-proportion formula), and
    whether the current arms already meet it. The normal quantiles
    enter as float LITERALS (repr-rendered — no in-engine erf), and
    the entire post-count float chain is ONE shared formula string
    parsed by both engines, so the hash oracle is exact. Zero-delta
    degenerates to NULL instead of dividing by zero."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    per_user = e.groupBy(
        "user_id", (F.col("user_id") % 2).alias("variant")
    ).agg(
        F.when(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) >= 14,
            F.lit(1).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("converted")
    )
    wide = per_user.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted")).otherwise(0)).cast("long").alias("x_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("converted")).otherwise(0)).cast("long").alias("x_b"),
    )
    return wide.select(
        "n_a",
        "n_b",
        "x_a",
        "x_b",
        F.expr(_PWR_PA).alias("p_a"),
        F.expr(_PWR_PB).alias("p_b"),
        F.expr(_PWR_DELTA).alias("observed_delta"),
        F.expr(_PWR_REQ).alias("required_n_per_arm"),
        F.expr(
            f"CASE WHEN {_PWR_REQ} IS NULL THEN CAST(NULL AS BOOLEAN) "
            f"ELSE LEAST(n_a, n_b) >= {_PWR_REQ} END"
        ).alias("adequately_powered"),
    )


PERM_N = 200  # deterministic pseudo-permutations (md5-derived arms)


@register(
    "stats_randomization_test",
    f"""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS arm,
             CAST(CAST(SUM(CAST(value AS DECIMAL(27,4))) AS VARCHAR)
                  AS DOUBLE) AS metric
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    obs AS (
      SELECT CAST(CAST(SUM(CASE WHEN arm = 0
                    THEN CAST(metric AS DECIMAL(27,4)) END) AS VARCHAR)
                  AS DOUBLE)
               / SUM(CASE WHEN arm = 0 THEN 1 END)
             - CAST(CAST(SUM(CASE WHEN arm = 1
                    THEN CAST(metric AS DECIMAL(27,4)) END) AS VARCHAR)
                  AS DOUBLE)
               / SUM(CASE WHEN arm = 1 THEN 1 END) AS obs_diff
      FROM per_user
    ),
    perms AS (
      SELECT b,
             CAST(CAST(SUM(CASE WHEN parm = 0
                    THEN CAST(metric AS DECIMAL(27,4)) END) AS VARCHAR)
                  AS DOUBLE)
               / SUM(CASE WHEN parm = 0 THEN 1 END)
             - CAST(CAST(SUM(CASE WHEN parm = 1
                    THEN CAST(metric AS DECIMAL(27,4)) END) AS VARCHAR)
                  AS DOUBLE)
               / SUM(CASE WHEN parm = 1 THEN 1 END) AS diff
      FROM (
        SELECT u.metric, t.b,
               ('0x' || substr(md5(u.user_id || '~' || t.b), 1, 1))::BIGINT
                 % 2 AS parm
        FROM per_user u, generate_series(0, {PERM_N - 1}) t(b)
      ) x
      GROUP BY b
    )
    SELECT o.obs_diff,
           CAST(SUM(CASE WHEN abs(p.diff) >= abs(o.obs_diff)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
           CAST({PERM_N} AS BIGINT) AS n_perms,
           CAST(1 + SUM(CASE WHEN abs(p.diff) >= abs(o.obs_diff)
                             THEN 1 ELSE 0 END) AS DOUBLE)
             / (1 + {PERM_N}) AS p_value
    FROM perms p, obs o
    GROUP BY o.obs_diff
    """,
)
def stats_randomization_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization (Fisher-style permutation) test for the arm mean
    difference — the distribution-free sibling of events_ab_ttest:
    the null distribution comes from 200 deterministic
    pseudo-reassignments (arm = md5(user ~ b) first-hex-digit parity —
    the house derandomization, same family as the LSH hyperplanes and
    weighted-sample keys), and the add-one p-value counts
    re-assignments at least as extreme as the observed |Δmean|. Every
    per-b mean rides the exact-DECIMAL string-round-trip double, so
    both engines compute bit-identical diffs and the ≥ comparisons
    agree exactly; a degenerate one-arm reassignment yields a NULL
    diff and counts as not-extreme on both engines.

    Scale: the B-fold expansion happens on the per-USER sliver (not
    the event table) and partial-aggregates map-side to ≤ B rows per
    partition — one events pass + one |users|·B sliver shuffle."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(27,4)"))
            .cast("string")
            .cast("double")
            .alias("metric")
        )
        .select("user_id", (F.col("user_id") % 2).alias("arm"), "metric")
        .persist()  # two consumers: the observed diff and the B-fold expansion
    )
    mdec = F.col("metric").cast("decimal(27,4)")

    def arm_diff(arm_col: str) -> Column:
        s0 = (
            F.sum(F.when(F.col(arm_col) == 0, mdec))
            .cast("string")
            .cast("double")
        )
        s1 = (
            F.sum(F.when(F.col(arm_col) == 1, mdec))
            .cast("string")
            .cast("double")
        )
        n0 = F.sum(F.when(F.col(arm_col) == 0, 1))
        n1 = F.sum(F.when(F.col(arm_col) == 1, 1))
        return s0 / n0 - s1 / n1

    obs = per_user.agg(arm_diff("arm").alias("obs_diff"))
    perms = (
        per_user.select(
            "user_id",
            "metric",
            F.explode(F.sequence(F.lit(0), F.lit(PERM_N - 1))).alias("b"),
        )
        .withColumn(
            "parm",
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("~", F.col("user_id"), F.col("b"))), 1, 1
                ),
                16,
                10,
            ).cast("long")
            % 2,
        )
        .groupBy("b")
        .agg(arm_diff("parm").alias("diff"))
    )
    return (
        perms.crossJoin(F.broadcast(obs))
        .groupBy("obs_diff")
        .agg(
            F.sum(
                F.when(F.abs(F.col("diff")) >= F.abs(F.col("obs_diff")), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_extreme"),
        )
        .select(
            "obs_diff",
            "n_extreme",
            F.lit(PERM_N).cast("long").alias("n_perms"),
            (
                (F.lit(1) + F.col("n_extreme")).cast("double")
                / F.lit(1 + PERM_N)
            ).alias("p_value"),
        )
    )


HOLT_SCALE = 10**6  # fixed-point units for level/trend state


def _holt_tdiv(expr: str, d: int = 4) -> str:
    """Sign-explicit TRUNCATING integer division — Spark's `div` and
    Python's mirrored trunc vs DuckDB's floor `//` disagree on
    negatives (the power-iteration note), so the oracle spells out
    trunc."""
    return (f"(CASE WHEN ({expr}) >= 0 THEN ({expr}) // {d} "
            f"ELSE -((-({expr})) // {d}) END)")


_HOLT_L = _holt_tdiv(f"x.n * {HOLT_SCALE} + 3 * (h.l + h.b)")
_HOLT_B = _holt_tdiv(f"{_HOLT_L} - h.l + 3 * h.b")


@register(
    "events_holt_smoothing",
    f"""
    WITH RECURSIVE
    daily AS (
      SELECT event_type, CAST({_TS} AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, day, n,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i
      FROM daily
    ),
    holt (event_type, i, day, n, l, b) AS (
      SELECT event_type, i, day, n, n * {HOLT_SCALE}, CAST(0 AS BIGINT)
      FROM idx WHERE i = 1
      UNION ALL
      SELECT x.event_type, x.i, x.day, x.n, {_HOLT_L}, {_HOLT_B}
      FROM holt h JOIN idx x
        ON x.event_type = h.event_type AND x.i = h.i + 1
    )
    SELECT event_type, day, n,
           l AS level_fp, b AS trend_fp,
           l + b AS forecast_next_fp
    FROM holt
    """,
)
def events_holt_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing (the EWMA entry's
    trend-aware upgrade) over per-type daily counts, in EXACT fixed
    point: α = β = 1/4 as truncating division by 4 of BIGINT state,
    so the full (level, trend, one-step forecast) trajectory is
    bit-replayable — the DuckDB twin advances one day per recursion
    with the identical sign-explicit trunc-division chain.

    Plan: one partial-aggregated daily rollup; the smoothing recursion
    runs driver-side over the collected rollup — bounded by calendar ×
    event-type vocabulary (30 × 5 here; the distinct-day-list collect
    precedent), never by event count. Convergence properties pinned in
    tests/test_temporal_stats_ops.py (exact next-value forecast on a
    linear series; trend → 0 on a constant series)."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()  # calendar × vocabulary bounded — never event-sized
    )
    by_type: dict[str, list] = {}
    for r in daily:
        by_type.setdefault(r.event_type, []).append((r.day, r.n))

    def tdiv(v: int, d: int = 4) -> int:
        return v // d if v >= 0 else -((-v) // d)

    rows = []
    for et, series in by_type.items():
        series.sort()
        l = series[0][1] * HOLT_SCALE
        b = 0
        rows.append((et, series[0][0], series[0][1], l, b, l + b))
        for day, n in series[1:]:
            l_new = tdiv(n * HOLT_SCALE + 3 * (l + b))
            b = tdiv(l_new - l + 3 * b)
            l = l_new
            rows.append((et, day, n, l, b, l + b))
    spark2 = spark
    return spark2.createDataFrame(
        rows,
        "event_type STRING, day DATE, n BIGINT, level_fp BIGINT, "
        "trend_fp BIGINT, forecast_next_fp BIGINT",
    )


BH_ALPHA_NUM, BH_ALPHA_DEN = 1, 10  # FDR level α = 0.1 as an exact rational


@register(
    "stats_bh_correction",
    f"""
    WITH per_user AS (
      SELECT event_type, user_id, user_id % 2 AS arm,
             CAST(CAST(SUM(CAST(value AS DECIMAL(27,4))) AS VARCHAR)
                  AS DOUBLE) AS metric
      FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
    ),
    obs AS (
      SELECT event_type,
             CAST(CAST(SUM(CASE WHEN arm = 0
                    THEN CAST(metric AS DECIMAL(27,4)) END) AS VARCHAR)
                  AS DOUBLE)
               / SUM(CASE WHEN arm = 0 THEN 1 END)
             - CAST(CAST(SUM(CASE WHEN arm = 1
                    THEN CAST(metric AS DECIMAL(27,4)) END) AS VARCHAR)
                  AS DOUBLE)
               / SUM(CASE WHEN arm = 1 THEN 1 END) AS obs_diff
      FROM per_user GROUP BY 1
    ),
    perms AS (
      SELECT event_type, b,
             CAST(CAST(SUM(CASE WHEN parm = 0
                    THEN CAST(metric AS DECIMAL(27,4)) END) AS VARCHAR)
                  AS DOUBLE)
               / SUM(CASE WHEN parm = 0 THEN 1 END)
             - CAST(CAST(SUM(CASE WHEN parm = 1
                    THEN CAST(metric AS DECIMAL(27,4)) END) AS VARCHAR)
                  AS DOUBLE)
               / SUM(CASE WHEN parm = 1 THEN 1 END) AS diff
      FROM (
        SELECT u.event_type, u.metric, t.b,
               ('0x' || substr(md5(u.user_id || '~' || t.b), 1, 1))::BIGINT
                 % 2 AS parm
        FROM per_user u, generate_series(0, {PERM_N - 1}) t(b)
      ) x
      GROUP BY 1, 2
    ),
    scores AS (
      SELECT o.event_type, o.obs_diff,
             CAST(1 + SUM(CASE WHEN abs(p.diff) >= abs(o.obs_diff)
                               THEN 1 ELSE 0 END) AS BIGINT) AS c
      FROM perms p JOIN obs o USING (event_type)
      GROUP BY 1, 2
    ),
    mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM scores),
    ranked AS (
      SELECT s.event_type, s.obs_diff, s.c, mm.m,
             ROW_NUMBER() OVER (ORDER BY s.c, s.event_type) AS p_rank
      FROM scores s, mm
    ),
    khat AS (
      SELECT MAX(CASE WHEN {BH_ALPHA_DEN} * m * c
                          <= p_rank * {BH_ALPHA_NUM} * (1 + {PERM_N})
                      THEN p_rank END) AS k
      FROM ranked
    )
    SELECT r.event_type, r.obs_diff,
           r.c - 1 AS n_extreme,
           CAST(r.c AS DOUBLE) / (1 + {PERM_N}) AS p_value,
           CAST(r.p_rank AS BIGINT) AS p_rank,
           r.p_rank <= COALESCE(k.k, 0) AS rejected
    FROM ranked r, khat k
    """,
)
def stats_bh_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR correction over the per-event-type
    family of randomization tests — the multiple-testing governance
    layer every per-segment experiment readout needs (5 segments
    tested at α=0.1 each would inflate the family-wise false-positive
    rate; BH bounds the FDR instead). Each segment's p-value is the
    EXACT add-one rational c/(1+B) from the stats_randomization_test
    machinery (deterministic md5 pseudo-permutations, DECIMAL
    string-round-trip means), so the BH step-up decision
    ``p_(k) ≤ k·α/m`` evaluates as the pure-INTEGER cross-product
    ``den·m·c ≤ k·num·(1+B)`` — no float threshold anywhere in the
    decision, hash-exact cross-engine.

    Scale: the B-fold expansion runs on the per-(type,user) sliver
    with map-side partial aggregation (the randomization-test shape ×
    the type vocabulary); the BH ranking window is GLOBAL but over m =
    |event-type vocabulary| rows — bounded by the schema, never by
    data."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    per_user = (
        e.groupBy("event_type", "user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(27,4)"))
            .cast("string")
            .cast("double")
            .alias("metric")
        )
        .select(
            "event_type", "user_id", (F.col("user_id") % 2).alias("arm"), "metric"
        )
        .persist()  # two consumers: observed diffs + the B-fold expansion
    )
    mdec = F.col("metric").cast("decimal(27,4)")

    def arm_diff(arm_col: str) -> Column:
        s0 = F.sum(F.when(F.col(arm_col) == 0, mdec)).cast("string").cast("double")
        s1 = F.sum(F.when(F.col(arm_col) == 1, mdec)).cast("string").cast("double")
        n0 = F.sum(F.when(F.col(arm_col) == 0, 1))
        n1 = F.sum(F.when(F.col(arm_col) == 1, 1))
        return s0 / n0 - s1 / n1

    obs = per_user.groupBy("event_type").agg(arm_diff("arm").alias("obs_diff"))
    perms = (
        per_user.select(
            "event_type",
            "user_id",
            "metric",
            F.explode(F.sequence(F.lit(0), F.lit(PERM_N - 1))).alias("b"),
        )
        .withColumn(
            "parm",
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("~", F.col("user_id"), F.col("b"))), 1, 1
                ),
                16,
                10,
            ).cast("long")
            % 2,
        )
        .groupBy("event_type", "b")
        .agg(arm_diff("parm").alias("diff"))
    )
    scores = (
        perms.join(obs, "event_type")
        .groupBy("event_type", "obs_diff")
        .agg(
            (
                F.lit(1)
                + F.sum(
                    F.when(
                        F.abs(F.col("diff")) >= F.abs(F.col("obs_diff")), 1
                    ).otherwise(0)
                )
            )
            .cast("long")
            .alias("c")
        )
    )
    mm = scores.agg(F.count(F.lit(1)).cast("long").alias("m"))
    # global rank window over m = |event-type vocabulary| rows only
    ranked = scores.crossJoin(F.broadcast(mm)).withColumn(
        "p_rank",
        F.row_number().over(
            Window.orderBy(F.col("c"), F.col("event_type"))
        ),
    )
    khat = ranked.agg(
        F.max(
            F.when(
                F.lit(BH_ALPHA_DEN) * F.col("m") * F.col("c")
                <= F.col("p_rank") * F.lit(BH_ALPHA_NUM) * F.lit(1 + PERM_N),
                F.col("p_rank"),
            )
        ).alias("k")
    )
    return ranked.crossJoin(F.broadcast(khat)).select(
        "event_type",
        "obs_diff",
        (F.col("c") - 1).alias("n_extreme"),
        (F.col("c").cast("double") / F.lit(1 + PERM_N)).alias("p_value"),
        F.col("p_rank").cast("long").alias("p_rank"),
        (F.col("p_rank") <= F.coalesce(F.col("k"), F.lit(0))).alias("rejected"),
    )


from .queries_text import NB_SCORE_CTES as _NB_CTES  # noqa: E402
from .queries_text import _NB_SRC_SQL  # noqa: E402


@register(
    "ml_eval_auc_nb",
    f"""
    WITH {_NB_CTES},
    scored AS (
      SELECT d.doc_id, CAST(d.llr + p.prior AS DOUBLE) AS nb_score
      FROM per_doc d CROSS JOIN priors p
    ),
    lab AS (
      SELECT s.nb_score, COUNT(*) AS n,
             SUM(CASE WHEN dd.source IN ({_NB_SRC_SQL})
                      THEN 1 ELSE 0 END) AS n_pos
      FROM scored s JOIN documents dd USING (doc_id)
      GROUP BY s.nb_score
    ),
    cum AS (
      SELECT nb_score, n, n_pos,
             SUM(n) OVER (ORDER BY nb_score) AS cum_n
      FROM lab
    ),
    tot AS (SELECT SUM(n) AS n_t, SUM(n_pos) AS p_t FROM lab)
    SELECT CAST(t.p_t AS BIGINT) AS n_pos,
           CAST(t.n_t - t.p_t AS BIGINT) AS n_neg,
           CAST(SUM(c.n_pos * (2 * (c.cum_n - c.n) + c.n + 1))
                - t.p_t * (t.p_t + 1) AS BIGINT) AS auc_num,
           CAST(2 * t.p_t * (t.n_t - t.p_t) AS BIGINT) AS auc_den,
           CAST(SUM(c.n_pos * (2 * (c.cum_n - c.n) + c.n + 1))
                - t.p_t * (t.p_t + 1) AS DOUBLE)
             / CAST(2 * t.p_t * (t.n_t - t.p_t) AS DOUBLE) AS auc
    FROM cum c, tot t
    GROUP BY t.p_t, t.n_t
    """,
)
def ml_eval_auc_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC-AUC of the NB quality classifier against its weak
    source labels — the model-eval metric the quality-gate family was
    missing. AUC is computed by the tie-aware Mann–Whitney rank
    identity: group docs by their (engine-identical) score, one
    distributed two-channel cumulative sum over the distinct-score
    frame (`_packed_cum` — NO unpartitioned window over data), then
    AUC = (Σ_pos 2·midrank − n⁺(n⁺+1)) / (2·n⁺·n⁻) with the numerator
    and denominator emitted as exact BIGINTs beside the one-division
    double. The score SQL is the imported text_nb_quality_score
    oracle body, so scorer and evaluator cannot drift."""
    from ..io import parallelize
    from .text import NB_TARGET_SOURCES, nb_quality_score

    docs = parallelize(load_table(spark, sf_dir, "documents"))
    scored = nb_quality_score(docs).select("doc_id", "nb_score")
    labels = docs.select(
        "doc_id",
        # when/otherwise: a NULL source labels NEGATIVE (0) like the
        # oracle CASE/ELSE — bare isin().cast() yields NULL, and an
        # all-NULL score group sums to NULL and falls out of the
        # packed cumsum (r13 null-corpus sweep find)
        F.when(F.col("source").isin(*NB_TARGET_SOURCES), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("pos"),
    )
    byscore = (
        scored.join(labels, "doc_id")
        .groupBy("nb_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("pos").cast("long").alias("n_pos"),
        )
    )
    cum = _packed_cum(byscore, "n", "n_pos", "nb_score")
    per = cum.select(
        (
            F.col("n_pos")
            * (2 * (F.col("_cum_a") - F.col("n")) + F.col("n") + 1)
        ).alias("r2"),
        F.col("_tot_a").alias("n_t"),
        F.col("_tot_b").alias("p_t"),
    )
    agg = per.groupBy("n_t", "p_t").agg(F.sum("r2").alias("r2_sum"))
    return agg.select(
        F.col("p_t").cast("long").alias("n_pos"),
        (F.col("n_t") - F.col("p_t")).cast("long").alias("n_neg"),
        (F.col("r2_sum") - F.col("p_t") * (F.col("p_t") + 1))
        .cast("long")
        .alias("auc_num"),
        (2 * F.col("p_t") * (F.col("n_t") - F.col("p_t")))
        .cast("long")
        .alias("auc_den"),
        (
            (F.col("r2_sum") - F.col("p_t") * (F.col("p_t") + 1)).cast("double")
            / (2 * F.col("p_t") * (F.col("n_t") - F.col("p_t"))).cast("double")
        ).alias("auc"),
    )


@register(
    "ml_eval_pr_curve",
    f"""
    WITH {_NB_CTES},
    scored AS (
      SELECT d.doc_id, CAST(d.llr + p.prior AS DOUBLE) AS nb_score
      FROM per_doc d CROSS JOIN priors p
    ),
    lab AS (
      SELECT s.nb_score, COUNT(*) AS n,
             SUM(CASE WHEN dd.source IN ({_NB_SRC_SQL})
                      THEN 1 ELSE 0 END) AS n_pos
      FROM scored s JOIN documents dd USING (doc_id)
      GROUP BY s.nb_score
    ),
    cum AS (
      SELECT nb_score, n, n_pos,
             SUM(n) OVER (ORDER BY nb_score) AS cum_n,
             SUM(n_pos) OVER (ORDER BY nb_score) AS cum_pos
      FROM lab
    ),
    tot AS (SELECT SUM(n) AS n_t, SUM(n_pos) AS p_t FROM lab)
    SELECT c.nb_score AS threshold,
           CAST(t.p_t - (c.cum_pos - c.n_pos) AS BIGINT) AS tp,
           CAST((t.n_t - (c.cum_n - c.n))
                - (t.p_t - (c.cum_pos - c.n_pos)) AS BIGINT) AS fp,
           CAST(c.cum_pos - c.n_pos AS BIGINT) AS fn,
           CAST(t.p_t - (c.cum_pos - c.n_pos) AS DOUBLE)
             / CAST(t.n_t - (c.cum_n - c.n) AS DOUBLE) AS precision,
           CAST(t.p_t - (c.cum_pos - c.n_pos) AS DOUBLE)
             / CAST(t.p_t AS DOUBLE) AS recall
    FROM cum c, tot t
    """,
)
def ml_eval_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full precision/recall curve of the NB quality gate: one
    point per DISTINCT score threshold θ (predict curated when
    score ≥ θ) — TP/FP/FN as exact integers from the same
    distinct-score two-channel cumulative sum as ml_eval_auc_nb
    (strictly-below counts convert to at-or-above via the totals),
    precision/recall as single IEEE divisions. The curve an operator
    reads to pick the gate threshold the keep/drop entry hard-codes.

    Scale: identical shape to the AUC entry — the only window rides
    the distinct-score frame through the two-pass ranked cumsum, and
    every output column derives from integers."""
    from ..io import parallelize
    from .text import NB_TARGET_SOURCES, nb_quality_score

    docs = parallelize(load_table(spark, sf_dir, "documents"))
    scored = nb_quality_score(docs).select("doc_id", "nb_score")
    labels = docs.select(
        "doc_id",
        # when/otherwise: a NULL source labels NEGATIVE (0) like the
        # oracle CASE/ELSE — bare isin().cast() yields NULL, and an
        # all-NULL score group sums to NULL and falls out of the
        # packed cumsum (r13 null-corpus sweep find)
        F.when(F.col("source").isin(*NB_TARGET_SOURCES), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("pos"),
    )
    byscore = (
        scored.join(labels, "doc_id")
        .groupBy("nb_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("pos").cast("long").alias("n_pos"),
        )
    )
    cum = _packed_cum(byscore, "n", "n_pos", "nb_score")
    below_n = F.col("_cum_a") - F.col("n")
    below_pos = F.col("_cum_b") - F.col("n_pos")
    tp = F.col("_tot_b") - below_pos
    at_or_above = F.col("_tot_a") - below_n
    return cum.select(
        F.col("nb_score").alias("threshold"),
        tp.cast("long").alias("tp"),
        (at_or_above - tp).cast("long").alias("fp"),
        below_pos.cast("long").alias("fn"),
        (tp.cast("double") / at_or_above.cast("double")).alias("precision"),
        (tp.cast("double") / F.col("_tot_b").cast("double")).alias("recall"),
    )


@register(
    "ml_eval_avg_precision_nb",
    f"""
    WITH {_NB_CTES},
    scored AS (
      SELECT d.doc_id, CAST(d.llr + p.prior AS DOUBLE) AS nb_score
      FROM per_doc d CROSS JOIN priors p
    ),
    lab AS (
      SELECT s.nb_score, COUNT(*) AS n,
             SUM(CASE WHEN dd.source IN ({_NB_SRC_SQL})
                      THEN 1 ELSE 0 END) AS n_pos
      FROM scored s JOIN documents dd USING (doc_id)
      GROUP BY s.nb_score
    ),
    cum AS (
      SELECT nb_score, n, n_pos,
             SUM(n) OVER (ORDER BY nb_score) AS cum_n,
             SUM(n_pos) OVER (ORDER BY nb_score) AS cum_pos
      FROM lab
    ),
    tot AS (SELECT SUM(n) AS n_t, SUM(n_pos) AS p_t FROM lab)
    SELECT CAST(t.p_t AS BIGINT) AS n_pos,
           CAST(t.n_t - t.p_t AS BIGINT) AS n_neg,
           CAST(SUM(CAST(
             CAST(c.n_pos * (t.p_t - (c.cum_pos - c.n_pos)) AS DOUBLE)
             / NULLIF(CAST(t.p_t * (t.n_t - (c.cum_n - c.n)) AS DOUBLE), 0)
           AS DECIMAL(20,9))) AS DOUBLE) AS avg_precision
    FROM cum c, tot t
    GROUP BY t.p_t, t.n_t
    """,
)
def ml_eval_avg_precision_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (PR-AUC, step interpolation — the sklearn
    ``average_precision_score`` convention) of the NB quality gate —
    the SCALAR the full ml_eval_pr_curve was missing, exactly as
    ml_eval_auc_nb is the scalar of the ROC sweep. Sweeping distinct
    scores descending, AP = Σ ΔR_i · P_i with ΔR_i = positives at the
    threshold / total positives and P_i = precision at-or-above —
    every factor an exact BIGINT from the SAME two-channel
    distinct-score cumulative sum the PR curve rides; each term is
    one IEEE division of two BIGINTs rounded to DECIMAL(20,9) before
    the order-free sum (the ece per-term precedent), NULLIF-pinned
    when a class is empty.

    Scale: identical to the AUC/PR entries — the only window is the
    two-pass packed cumsum over the distinct-score frame."""
    from ..io import parallelize
    from .text import NB_TARGET_SOURCES, nb_quality_score

    docs = parallelize(load_table(spark, sf_dir, "documents"))
    scored = nb_quality_score(docs).select("doc_id", "nb_score")
    labels = docs.select(
        "doc_id",
        # when/otherwise: a NULL source labels NEGATIVE (0) like the
        # oracle CASE/ELSE — bare isin().cast() yields NULL, and an
        # all-NULL score group sums to NULL and falls out of the
        # packed cumsum (r13 null-corpus sweep find)
        F.when(F.col("source").isin(*NB_TARGET_SOURCES), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("pos"),
    )
    byscore = (
        scored.join(labels, "doc_id")
        .groupBy("nb_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("pos").cast("long").alias("n_pos"),
        )
    )
    cum = _packed_cum(byscore, "n", "n_pos", "nb_score")
    tp = F.col("_tot_b") - (F.col("_cum_b") - F.col("n_pos"))
    at_or_above = F.col("_tot_a") - (F.col("_cum_a") - F.col("n"))
    term = (F.col("n_pos") * tp).cast("double") / F.nullif(
        (F.col("_tot_b") * at_or_above).cast("double"), F.lit(0.0)
    )
    agg = cum.groupBy(
        F.col("_tot_a").alias("n_t"), F.col("_tot_b").alias("p_t")
    ).agg(
        F.sum(term.cast("decimal(20,9)")).cast("double").alias("avg_precision")
    )
    return agg.select(
        F.col("p_t").cast("long").alias("n_pos"),
        (F.col("n_t") - F.col("p_t")).cast("long").alias("n_neg"),
        "avg_precision",
    )


@register(
    "stats_anova_oneway",
    """
    WITH g AS (
      SELECT l_returnflag AS grp,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,4))) AS DOUBLE) AS s,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice
                           AS DECIMAL(27,4))) AS DOUBLE) AS q
      FROM lineitem GROUP BY l_returnflag
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(CAST(s AS DECIMAL(27,4))) AS DOUBLE) AS s,
             CAST(SUM(CAST(q AS DECIMAL(27,4))) AS DOUBLE) AS q,
             CAST(SUM(CAST(s * s / n AS DECIMAL(27,4))) AS DOUBLE) AS sqn
      FROM g
    )
    SELECT k, n,
           sqn - s * s / n AS ss_between,
           q - sqn AS ss_within,
           (sqn - s * s / n) / NULLIF(k - 1, 0)
             / NULLIF((q - sqn) / NULLIF(n - k, 0), 0) AS f_stat,
           (sqn - s * s / n) / NULLIF(q - s * s / n, 0) AS eta_sq
    FROM tot
    """,
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of l_extendedprice across the three return-flag
    groups — completes the parametric corner of the test suite
    (t-test/z-test pairwise, Mann-Whitney/KS nonparametric,
    chi-square categorical): F = (SSB/(k−1)) / (SSW/(N−k)) with
    SSB = Σ S_g²/n_g − S²/N and SSW = Σ Q_g − Σ S_g²/n_g, all from
    per-group (n, Σx, Σx²) — ONE partial-aggregated scan, a k-row
    rollup, zero data-sized shuffles at any scale.

    Exactness: per-row x and x² round to DECIMAL(27,4) before the
    sums (the dsum discipline), so group sums are order-free; the
    per-group S_g²/n_g division is one IEEE op re-rounded to decimal
    before the k-row rollup; the final F/η² are fixed short double
    chains — bit-equal cross-engine. Also emits η² (effect size),
    the number a filter-design decision actually reads."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(27,4)"))
        .cast("double")
        .alias("s"),
        F.sum(
            (F.col("l_extendedprice") * F.col("l_extendedprice")).cast(
                "decimal(27,4)"
            )
        )
        .cast("double")
        .alias("q"),
    )
    tot = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("n"),
        F.sum(F.col("s").cast("decimal(27,4)")).cast("double").alias("s"),
        F.sum(F.col("q").cast("decimal(27,4)")).cast("double").alias("q"),
        F.sum((F.col("s") * F.col("s") / F.col("n")).cast("decimal(27,4)"))
        .cast("double")
        .alias("sqn"),
    )
    sq_over_n = F.col("s") * F.col("s") / F.col("n")
    ssb = F.col("sqn") - sq_over_n
    ssw = F.col("q") - F.col("sqn")
    return tot.select(
        "k",
        "n",
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        # NULLIF pins the degenerate denominators (single group k=1,
        # one row per group n=k, zero within/total SS) to NULL on BOTH
        # engines — DuckDB double division would yield inf/NaN where
        # Spark non-ANSI division yields NULL (the lsh_recall_report
        # precedent, ADVICE r12).
        (
            ssb
            / F.nullif((F.col("k") - 1).cast("double"), F.lit(0.0))
            / F.nullif(
                ssw / F.nullif((F.col("n") - F.col("k")).cast("double"), F.lit(0.0)),
                F.lit(0.0),
            )
        ).alias("f_stat"),
        (ssb / F.nullif(F.col("q") - sq_over_n, F.lit(0.0))).alias("eta_sq"),
    )


# ---------------------------------------------------------------------
# sequential A/B testing — mSPRT always-valid inference
# ---------------------------------------------------------------------

# mixture prior variance τ² for the mSPRT normal mixing distribution
# (Johari et al. 2017/2022, "Always Valid Inference"): the prior scale
# of the effect size in metric units (per-user revenue sums are
# O(100) on the fixture). A deployment tunes τ to the effect sizes it
# wants earliest detection for; the statistic stays always-valid for
# ANY fixed τ, so the constant is a sensitivity knob, not a validity
# assumption.
AB_SEQ_TAU2 = 100.0

_AB_SEQ_ORACLE = f"""
    WITH per_user AS (
      SELECT user_id % 2 AS variant,
             MIN(CAST({_TS} AS DATE)) AS first_day,
             SUM(CAST(value AS DECIMAL(27,4))) AS metric
      FROM events GROUP BY user_id
    ),
    dv AS (
      SELECT first_day, variant,
             CAST(count(*) AS BIGINT) AS n,
             SUM(CAST(metric AS DECIMAL(27,4))) AS s_dec,
             SUM(CAST(CAST(metric AS DECIMAL(19,4)) * CAST(metric AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS ss_dec
      FROM per_user GROUP BY first_day, variant
    ),
    grid AS (
      SELECT d.first_day, v.variant
      FROM (SELECT DISTINCT first_day FROM per_user) d
      CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT))) v(variant)
    ),
    filled AS (
      SELECT g.first_day, g.variant,
             coalesce(dv.n, 0) AS n,
             coalesce(dv.s_dec, CAST(0 AS DECIMAL(27,4))) AS s_dec,
             coalesce(dv.ss_dec, CAST(0 AS DECIMAL(38,8))) AS ss_dec
      FROM grid g LEFT JOIN dv ON dv.first_day = g.first_day AND dv.variant = g.variant
    ),
    cum AS (
      SELECT first_day, variant,
             CAST(SUM(n) OVER w AS BIGINT) AS cn,
             CAST(CAST(SUM(s_dec) OVER w AS VARCHAR) AS DOUBLE) AS cs,
             CAST(CAST(SUM(ss_dec) OVER w AS VARCHAR) AS DOUBLE) AS css
      FROM filled
      WINDOW w AS (PARTITION BY variant ORDER BY first_day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    wide AS (
      SELECT first_day AS day,
             MAX(CASE WHEN variant = 0 THEN cn END) AS n_a,
             MAX(CASE WHEN variant = 1 THEN cn END) AS n_b,
             MAX(CASE WHEN variant = 0 THEN cs END) AS s_a,
             MAX(CASE WHEN variant = 1 THEN cs END) AS s_b,
             MAX(CASE WHEN variant = 0 THEN css END) AS ss_a,
             MAX(CASE WHEN variant = 1 THEN css END) AS ss_b
      FROM cum GROUP BY first_day
    ),
    stats AS (
      SELECT day, n_a, n_b,
             s_a / NULLIF(n_a, 0) AS mean_a,
             s_b / NULLIF(n_b, 0) AS mean_b,
             (ss_a - s_a * s_a / NULLIF(n_a, 0)) / NULLIF(n_a - 1, 0) AS var_a,
             (ss_b - s_b * s_b / NULLIF(n_b, 0)) / NULLIF(n_b - 1, 0) AS var_b
      FROM wide
    ),
    vn AS (
      SELECT day, n_a, n_b, mean_a, mean_b,
             mean_a - mean_b AS theta,
             var_a / NULLIF(n_a, 0) + var_b / NULLIF(n_b, 0) AS v_n
      FROM stats
    )
    SELECT day, n_a, n_b, mean_a, mean_b, theta, v_n,
           CASE WHEN v_n > 0 THEN
             sqrt(v_n / (v_n + CAST(100 AS DOUBLE))) END AS mix_shrink,
           CASE WHEN v_n > 0 THEN
             theta * theta * CAST(100 AS DOUBLE)
               / (2 * v_n * (v_n + CAST(100 AS DOUBLE))) END AS exp_arg
    FROM vn
    """


def events_ab_sequential_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-indexed mSPRT monitoring trajectory INCLUDING the
    transcendental columns (log_lambda, the always-valid p-value, and
    the α=0.05 decision) — the user-facing surface; the registered
    entry compares the boundary-safe projection (the Kaplan-Meier
    _full precedent: ln/exp may differ by 1 ulp across libm builds,
    so they are pytest-pinned instead of oracle-hashed)."""
    e = load_table(spark, sf_dir, "events")
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.min(F.to_date("ts")).alias("first_day"),
            F.sum(F.col("value").cast("decimal(27,4)")).alias("metric"),
        )
        .select((F.col("user_id") % 2).alias("variant"), "first_day", "metric")
    )
    m18 = F.col("metric").cast("decimal(18,4)")
    dv = per_user.groupBy("first_day", "variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("metric").cast("decimal(27,4)")).alias("s_dec"),
        F.sum((m18 * m18).cast("decimal(38,8)")).alias("ss_dec"),
    )
    grid = (
        per_user.select("first_day")
        .distinct()
        .crossJoin(
            spark.range(2).select(F.col("id").cast("long").alias("variant"))
        )
    )
    filled = grid.join(dv, ["first_day", "variant"], "left").select(
        "first_day",
        "variant",
        F.coalesce("n", F.lit(0).cast("long")).alias("n"),
        F.coalesce("s_dec", F.lit(0).cast("decimal(27,4)")).alias("s_dec"),
        F.coalesce("ss_dec", F.lit(0).cast("decimal(38,8)")).alias("ss_dec"),
    )
    # per-variant cumulative moments: the window rides the DAY grid
    # (calendar-bounded — |days| rows per arm, the events_wow_growth
    # exemption class), never the event stream
    w = (
        Window.partitionBy("variant")
        .orderBy("first_day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = filled.select(
        "first_day",
        "variant",
        F.sum("n").over(w).cast("long").alias("cn"),
        F.sum("s_dec").over(w).cast("string").cast("double").alias("cs"),
        F.sum("ss_dec").over(w).cast("string").cast("double").alias("css"),
    )

    def pick(c: str, v: int):
        return F.max(F.when(F.col("variant") == v, F.col(c)))

    wide = cum.groupBy(F.col("first_day").alias("day")).agg(
        pick("cn", 0).alias("n_a"),
        pick("cn", 1).alias("n_b"),
        pick("cs", 0).alias("s_a"),
        pick("cs", 1).alias("s_b"),
        pick("css", 0).alias("ss_a"),
        pick("css", 1).alias("ss_b"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    s_a, s_b = F.col("s_a"), F.col("s_b")
    ss_a, ss_b = F.col("ss_a"), F.col("ss_b")
    zero = F.lit(0.0)
    stats = wide.select(
        "day",
        "n_a",
        "n_b",
        (s_a / F.nullif(n_a.cast("double"), zero)).alias("mean_a"),
        (s_b / F.nullif(n_b.cast("double"), zero)).alias("mean_b"),
        (
            (ss_a - s_a * s_a / F.nullif(n_a.cast("double"), zero))
            / F.nullif((n_a - 1).cast("double"), zero)
        ).alias("var_a"),
        (
            (ss_b - s_b * s_b / F.nullif(n_b.cast("double"), zero))
            / F.nullif((n_b - 1).cast("double"), zero)
        ).alias("var_b"),
    )
    tau2 = F.lit(AB_SEQ_TAU2)
    theta = F.col("mean_a") - F.col("mean_b")
    v_n = F.col("var_a") / F.nullif(
        F.col("n_a").cast("double"), zero
    ) + F.col("var_b") / F.nullif(F.col("n_b").cast("double"), zero)
    vn = stats.select(
        "day", "n_a", "n_b", "mean_a", "mean_b",
        theta.alias("theta"), v_n.alias("v_n"),
    )
    v = F.col("v_n")
    th = F.col("theta")
    per_day = vn.select(
        "day", "n_a", "n_b", "mean_a", "mean_b", "theta", "v_n",
        F.when(v > 0, F.sqrt(v / (v + tau2))).alias("mix_shrink"),
        F.when(v > 0, th * th * tau2 / (F.lit(2.0) * v * (v + tau2))).alias(
            "exp_arg"
        ),
    )
    # the transcendental tail: logΛ, the running-max crossing state,
    # and the always-valid p (non-increasing by construction). The
    # running max rides the |days| frame — pruned out of the
    # registered entry's plan along with these columns.
    log_lambda = F.log(F.col("mix_shrink")) + F.col("exp_arg")
    wd = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    with_ll = per_day.withColumn("log_lambda", log_lambda).withColumn(
        "p_always_valid",
        F.least(F.lit(1.0), F.exp(-F.max("log_lambda").over(wd))),
    )
    return with_ll.withColumn(
        "reject_05", F.col("p_always_valid") < F.lit(0.05)
    )


@register("events_ab_sequential", _AB_SEQ_ORACLE)
def events_ab_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential A/B testing via the mSPRT (mixture sequential
    probability ratio test — Johari, Koomen, Pekelis & Walsh,
    "Peeking at A/B Tests" / always-valid inference): the missing
    member of the experimentation family (t/z/DiD/CUPED/power/
    randomization/BH test a FIXED horizon; this one is valid under
    CONTINUOUS monitoring). Users split into arms by ``user_id % 2``
    (the events_ab_ttest assignment), per-user metric = exact DECIMAL
    revenue sum, indexed by the user's arrival day (first event
    date); each day's row is the experiment state had you peeked that
    day:

        Λ_n = √(Vn/(Vn+τ²)) · exp(θ̂²τ² / (2·Vn·(Vn+τ²)))
        p_n = min(p_{{n-1}}, 1/Λ_n)            (always-valid p-value)

    with θ̂ = mean_a − mean_b and Vn = var_a/n_a + var_b/n_b from the
    cumulative exact-decimal moments.

    Compared output: day, arm counts/means, θ̂, Vn, and Λ's two
    factors in EXACT form — mix_shrink = √(Vn/(Vn+τ²)) and exp_arg =
    θ̂²τ²/(2Vn(Vn+τ²)) (+,−,×,÷,√ are all correctly rounded IEEE ops
    over identical decimal-string-converted inputs, so bit-identical
    across engines). logΛ / p_always_valid / reject_05 need exp/ln
    (1-ulp libm hazard) and live in events_ab_sequential_full,
    pytest-pinned including the crossing-boundary trajectory (the
    customer_survival_km split). Degenerate guards: one-arm / n≤1 /
    zero-variance days NULL out via NULLIF on both engines (the r13
    zero-traffic precedent). The oracle squares the metric at
    DECIMAL(19,4), not the engine's (18,4): DuckDB's DECIMAL(18)
    multiply runs on the int64 fast path and RAISES around metric
    ≈ 3e13 where Spark's (37,8) product still fits — precision 19
    forces DuckDB's int128 path so both engines widen (the r14
    extreme-values sweep find; the events_ab_ttest oracle made the
    same choice). Beyond metric ≈ 1e14 the engine's (18,4) cast
    itself NULLs — the documented _dsum_sq family bound.

    Scale: two partial-aggregatable rollups (user, then day×arm); the
    cumulative window rides the calendar-bounded day grid (|days|
    rows per arm — the events_wow_growth class), never the event
    stream; the pivot is a |days|-row conditional aggregation."""
    return events_ab_sequential_full(spark, sf_dir).drop(
        "log_lambda", "p_always_valid", "reject_05"
    )
