"""Statistical aggregates and date/string scalar coverage.

Variance/stddev/correlation are computed FROM EXACT DECIMAL SUMS
(sum, sum of squares, sum of products) rather than the engines'
native streaming aggregators — native implementations (Welford /
two-pass) produce different last-bit doubles per engine and per
partition order, while the moment formulas over exact sums are a
fixed sequence of IEEE double ops on identical inputs. Same operator
capability, reproducible answer — and the exact sums are themselves
partial-aggregatable (scale-safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

_TS = "CAST(ts AS TIMESTAMP)"


def _dsum(col, scale=4):
    # string round-trip: decimal->double conversion is correctly rounded
    # from the digit string in both engines, while DuckDB's direct
    # decimal->double double-rounds once the scaled int exceeds 2^53
    return F.sum(F.col(col).cast(f"decimal(27,{scale})")).cast("string").cast("double")


def _dsum_sq(col, scale=8):
    # square of a 2-decimal value has 4 decimals; scale 8 is exact
    c = F.col(col).cast("decimal(18,4)")
    return F.sum((c * c).cast(f"decimal(38,{scale})")).cast("string").cast("double")


@register(
    "agg_variance_from_sums",
    """
    WITH sums AS (
      SELECT l_returnflag,
             count(*) AS n,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS VARCHAR) AS DOUBLE) AS s,
             CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS ss
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (ss - s * s / n) / (n - 1) AS var_qty,
           sqrt((ss - s * s / n) / (n - 1)) AS stddev_qty,
           s / n AS mean_qty
    FROM sums
    """,
)
def agg_variance_from_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance/stddev per group via the moment formula over
    exact sums (one pass, partial-aggregated)."""
    li = load_table(spark, sf_dir, "lineitem")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum("l_quantity").alias("s"),
        _dsum_sq("l_quantity").alias("ss"),
    )
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    var = (ss - s * s / n) / (n - 1)
    return sums.select(
        "l_returnflag", "n",
        var.alias("var_qty"),
        F.sqrt(var).alias("stddev_qty"),
        (s / n).alias("mean_qty"),
    )


@register(
    "agg_correlation_from_sums",
    """
    WITH sums AS (
      SELECT count(*) AS n,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,4))) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS syy,
             CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS sxy
      FROM lineitem
    )
    SELECT n,
           (sxy - sx * sy / n) / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)) AS corr_qty_price,
           (sxy - sx * sy / n) / (n - 1) AS covar_qty_price
    FROM sums
    """,
)
def agg_correlation_from_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample covariance from exact sums."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,4)")
    p = F.col("l_extendedprice").cast("decimal(18,4)")
    sums = li.agg(
        F.count(F.lit(1)).alias("n"),
        _dsum("l_quantity").alias("sx"),
        _dsum("l_extendedprice").alias("sy"),
        F.sum((q * q).cast("decimal(38,8)")).cast("string").cast("double").alias("sxx"),
        F.sum((p * p).cast("decimal(38,8)")).cast("string").cast("double").alias("syy"),
        F.sum((q * p).cast("decimal(38,8)")).cast("string").cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return sums.select(
        "n",
        ((sxy - sx * sy / n) / F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))).alias("corr_qty_price"),
        ((sxy - sx * sy / n) / (n - 1)).alias("covar_qty_price"),
    )


@register(
    "date_parts",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mon,
           CAST(day(o_orderdate) AS INTEGER) AS dom,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(dayofweek(o_orderdate) AS INTEGER) + 1 AS dow_sun1,
           CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS year_month,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS due_date,
           datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch_start
    FROM orders
    """,
)
def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction and arithmetic. DOW convention pinned to
    Sunday=1 (Spark's native dayofweek; DuckDB's Sunday=0 shifted)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow_sun1"),
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 90).alias("due_date"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
    )


@register(
    "string_functions_extended",
    """
    SELECT p_partkey,
           lpad(p_brand, 12, '*') AS brand_padded,
           rpad(p_type, 10, '.') AS type_padded,
           trim('  ' || p_name || '  ') AS name_trimmed,
           reverse(p_name) AS name_reversed,
           repeat(p_brand, 2) AS brand_twice,
           contains(p_name, 'red') AS has_red,
           starts_with(p_type, 'PRO') AS is_promo,
           ends_with(p_name, 'bolt') AS is_bolt,
           CAST(strpos(p_name, ' ') AS INTEGER) AS first_space,
           translate(p_brand, '#', '-') AS brand_dashed
    FROM part
    """,
)
def string_functions_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.rpad("p_type", 10, ".").alias("type_padded"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trimmed"),
        F.reverse("p_name").alias("name_reversed"),
        F.repeat("p_brand", 2).alias("brand_twice"),
        F.contains("p_name", F.lit("red")).alias("has_red"),
        F.startswith("p_type", F.lit("PRO")).alias("is_promo"),
        F.endswith("p_name", F.lit("bolt")).alias("is_bolt"),
        F.instr("p_name", " ").alias("first_space"),
        F.translate("p_brand", "#", "-").alias("brand_dashed"),
    )


@register(
    "percentile_exact",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median (both engines: linear interpolation
    over the sorted group — identical arithmetic on quantity's
    half-integer grid)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("median_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@register(
    "anomaly_zscore_events",
    """
    WITH sums AS (
      SELECT event_type, count(*) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(27,4))) AS VARCHAR) AS DOUBLE) AS s,
             CAST(CAST(SUM(CAST(CAST(value AS DECIMAL(19,4)) * CAST(value AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS ss
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           (e.value - s.s / s.n)
             / sqrt((s.ss - s.s * s.s / s.n) / (s.n - 1)) AS zscore
    FROM events e JOIN sums s ON e.event_type = s.event_type
    WHERE abs(e.value - s.s / s.n)
            > 3.0 * sqrt((s.ss - s.s * s.s / s.n) / (s.n - 1))
    """,
)
def anomaly_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection (|z| > 3): the data-quality
    gate a pipeline runs before training ingestion. Moments come from
    exact decimal sums (one partial-aggregated pass), joined back as a
    per-type scalar row — at 100 TB the sums side is |groups| rows,
    broadcast by AQE, and the filter is map-side."""
    e = load_table(spark, sf_dir, "events")
    sums = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum("value").alias("s"),
        _dsum_sq("value").alias("ss"),
    )
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    mean = s / n
    std = F.sqrt((ss - s * s / n) / (n - 1))
    return (
        e.join(sums, "event_type")
        .where(F.abs(F.col("value") - mean) > F.lit(3.0) * std)
        .select(
            "event_id",
            "event_type",
            "value",
            ((F.col("value") - mean) / std).alias("zscore"),
        )
    )


@register(
    "value_histogram",
    """
    SELECT CAST(floor(l_quantity / 5.0) AS BIGINT) AS bin,
           CAST(floor(l_quantity / 5.0) AS BIGINT) * CAST(5.0 AS DOUBLE) AS bin_low,
           count(*) AS n
    FROM lineitem GROUP BY 1
    """,
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (bin = floor(x/w)): one partial-aggregated
    groupBy on the bin expression; the 2-decimal input grid means no
    value ever sits on a float-rounding boundary of the bin edges."""
    li = load_table(spark, sf_dir, "lineitem")
    bin_ = F.floor(F.col("l_quantity") / 5.0).cast("bigint")
    return li.groupBy(bin_.alias("bin")).agg(
        (F.col("bin") * 5.0).alias("bin_low"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "stats_winsorize_lineitem",
    """
    WITH cuts AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.05) AS p05,
             quantile_cont(l_extendedprice, 0.95) AS p95
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, l.l_extendedprice,
           least(greatest(l.l_extendedprice, c.p05), c.p95) AS price_winsorized,
           (l.l_extendedprice < c.p05 OR l.l_extendedprice > c.p95) AS clipped
    FROM lineitem l JOIN cuts c ON c.l_returnflag = l.l_returnflag
    """,
)
def stats_winsorize_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (outlier clipping at [P05, P95] per group) — the
    standard robust-statistics cleaning pass. Exact interpolated
    percentiles per group (constant group count → tiny cut table, AQE
    broadcasts it unhinted), then one map-side least/greatest clip
    over the fact scan. Both engines interpolate identically on the
    sorted group (same arithmetic as percentile_exact)."""
    li = load_table(spark, sf_dir, "lineitem")
    cuts = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.05)).alias("p05"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("p95"),
    )
    return li.join(cuts, "l_returnflag").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_extendedprice",
        F.least(F.greatest(F.col("l_extendedprice"), F.col("p05")), F.col("p95")).alias(
            "price_winsorized"
        ),
        ((F.col("l_extendedprice") < F.col("p05")) | (F.col("l_extendedprice") > F.col("p95"))).alias(
            "clipped"
        ),
    )


ROBUST_Z_K = 3.5
MAD_CONSISTENCY = 1.4826  # Gaussian consistency constant


@register(
    "stats_robust_zscore",
    f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             abs(e.value - m.med) AS adev
      FROM events e JOIN med m ON m.event_type = e.event_type
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, d.value, d.med, x.mad,
           (d.value - d.med) / ({MAD_CONSISTENCY} * x.mad) AS robust_z
    FROM dev d JOIN mad x ON x.event_type = d.event_type
    WHERE x.mad > 0
      AND abs(d.value - d.med) > {ROBUST_Z_K} * ({MAD_CONSISTENCY} * x.mad)
    """,
)
def stats_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD outlier detection (|robust z| > 3.5) — the
    breakdown-resistant twin of anomaly_zscore_events: a single wild
    value shifts mean and σ (masking itself), but moves the median and
    MAD not at all, so contaminated groups still flag correctly.

    Two exact interpolated percentiles per group (median, then median
    absolute deviation), each a |groups|-row scalar table joined back
    (AQE broadcasts unhinted — constant group cardinality); the flag
    itself is a map-side predicate over the fact scan. Zero-MAD groups
    (>50% identical values) are excluded on both engines — the robust
    score is undefined there.
    """
    e = load_table(spark, sf_dir, "events")
    # persist the |types|-row median table (its events-agg subtree fed
    # every dev consumer); the per-event dev frame itself stays
    # unpersisted — two narrow (id, type, value) re-scans beat caching
    # a fact-sized frame at 100 TB
    med = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    ).persist()
    dev = e.join(med, "event_type").select(
        "event_id",
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(mad, "event_type")
        .where(
            (F.col("mad") > 0)
            & (
                F.abs(F.col("value") - F.col("med"))
                > ROBUST_Z_K * (MAD_CONSISTENCY * F.col("mad"))
            )
        )
        .select(
            "event_id",
            "event_type",
            "value",
            "med",
            "mad",
            (
                (F.col("value") - F.col("med"))
                / (MAD_CONSISTENCY * F.col("mad"))
            ).alias("robust_z"),
        )
    )


@register(
    "events_burst_detection",
    f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    med AS (
      SELECT event_type, quantile_cont(n_events, 0.5) AS med
      FROM hourly GROUP BY event_type
    ),
    dev AS (
      SELECT h.event_type, h.hour_ts, h.n_events, m.med,
             abs(h.n_events - m.med) AS adev
      FROM hourly h JOIN med m ON m.event_type = h.event_type
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type, d.hour_ts, d.n_events, d.med, x.mad,
           (d.n_events - d.med) / ({MAD_CONSISTENCY} * x.mad) AS robust_z
    FROM dev d JOIN mad x ON x.event_type = d.event_type
    WHERE x.mad > 0
      AND abs(d.n_events - d.med) > {ROBUST_Z_K} * ({MAD_CONSISTENCY} * x.mad)
    """,
)
def events_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-burst detection: robust z over per-(type, hour) event
    counts — the median/MAD machinery composed onto a time series, so
    a genuine burst cannot mask itself by inflating the mean. The
    hourly rollup is one partial-aggregated shuffle; the two
    percentile tables are |types|-sized scalars joined back (AQE
    broadcasts); the flag is map-side."""
    e = load_table(spark, sf_dir, "events")
    # persisted calendar-bounded hourly rollup: med/dev/mad would each
    # re-run the events aggregation otherwise (4 scans cold)
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(F.count(F.lit(1)).alias("n_events")).persist()
    med = hourly.groupBy("event_type").agg(
        F.percentile("n_events", F.lit(0.5)).alias("med")
    )
    dev = hourly.join(med, "event_type").select(
        "event_type",
        "hour_ts",
        "n_events",
        "med",
        F.abs(F.col("n_events") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(mad, "event_type")
        .where(
            (F.col("mad") > 0)
            & (
                F.abs(F.col("n_events") - F.col("med"))
                > ROBUST_Z_K * (MAD_CONSISTENCY * F.col("mad"))
            )
        )
        .select(
            "event_type",
            "hour_ts",
            "n_events",
            "med",
            "mad",
            (
                (F.col("n_events") - F.col("med"))
                / (MAD_CONSISTENCY * F.col("mad"))
            ).alias("robust_z"),
        )
    )


@register(
    "events_cusum_changepoints",
    f"""
    WITH daily AS (
      SELECT event_type, CAST({_TS} AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             count(*) AS n_days,
             CAST(SUM(CAST(n AS DECIMAL(27,0))) AS DOUBLE) / count(*) AS mu,
             sqrt(
               (CAST(SUM(CAST(n * n AS DECIMAL(27,0))) AS DOUBLE)
                - CAST(SUM(CAST(n AS DECIMAL(27,0))) AS DOUBLE)
                  * CAST(SUM(CAST(n AS DECIMAL(27,0))) AS DOUBLE) / count(*))
               / count(*)) AS sigma
      FROM daily GROUP BY event_type
    ),
    runs AS (
      SELECT d.event_type, d.day, d.n, s.mu, s.sigma,
             CAST(SUM(CAST(d.n AS DECIMAL(27,0)))
                    OVER (PARTITION BY d.event_type ORDER BY d.day
                          ROWS UNBOUNDED PRECEDING) AS DOUBLE)
               - CAST(ROW_NUMBER()
                    OVER (PARTITION BY d.event_type ORDER BY d.day)
                      AS DOUBLE) * s.mu AS cusum
      FROM daily d JOIN stats s ON s.event_type = d.event_type
    )
    SELECT event_type, day, CAST(n AS BIGINT) AS n, cusum,
           CASE WHEN abs(cusum) > 3 * sigma THEN 1 ELSE 0 END
             AS is_changepoint
    FROM runs
    """,
)
def events_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection over daily event-type volumes
    (Page 1954): the cumulative deviation from the per-type mean,
    flagged where |CUSUM| exceeds 3σ — drift that per-day z-scores
    can't see (a small persistent shift never trips a pointwise
    threshold but accumulates here). Numerics are engine-exact with
    NO double accumulation: CUSUM_d = (integer running sum) − d·μ,
    one multiply + subtract per row; μ and σ come from the integer
    Σn / Σn² sums (the variance-from-sums identity) with
    correctly-rounded sqrt. One day-level aggregation plus one
    per-type window — the fact shuffles once."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    dsum_n = F.sum(F.col("n").cast("decimal(27,0)")).cast("double")
    dsum_n2 = F.sum((F.col("n") * F.col("n")).cast("decimal(27,0)")).cast("double")
    cnt = F.count(F.lit(1))
    stats = daily.groupBy("event_type").agg(
        (dsum_n / cnt).alias("mu"),
        F.sqrt((dsum_n2 - dsum_n * dsum_n / cnt) / cnt).alias("sigma"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    runs = (
        daily.join(stats, "event_type")
        .withColumn(
            "cusum",
            F.sum(F.col("n").cast("decimal(27,0)"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double")
            - F.row_number().over(w).cast("double") * F.col("mu"),
        )
    )
    return runs.select(
        "event_type",
        "day",
        F.col("n").cast("bigint").alias("n"),
        "cusum",
        F.when(F.abs("cusum") > 3 * F.col("sigma"), 1).otherwise(0).alias(
            "is_changepoint"
        ),
    )


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_sql() -> str:
    """One-pass correlation matrix oracle: every Σx, Σx², Σxy in one
    aggregation (same decimal→varchar→double parity trick as
    agg_correlation_from_sums), then the 6 pairs stacked to rows."""
    cols = _CORR_COLS
    d19 = lambda c: f"CAST({c} AS DECIMAL(19,4))"  # noqa: E731
    terms = [f"count(*) AS n"]
    for i, c in enumerate(cols):
        terms.append(
            f"CAST(CAST(SUM(CAST({c} AS DECIMAL(27,4))) AS VARCHAR) AS DOUBLE) AS s{i}"
        )
    for i, a in enumerate(cols):
        for j, b in enumerate(cols):
            if i <= j:
                terms.append(
                    f"CAST(CAST(SUM(CAST({d19(a)} * {d19(b)} AS DECIMAL(38,8)))"
                    f" AS VARCHAR) AS DOUBLE) AS s{i}{j}"
                )
    pair_rows = []
    for i, a in enumerate(cols):
        for j, b in enumerate(cols):
            if i < j:
                corr = (
                    f"(s{i}{j} - s{i} * s{j} / n)"
                    f" / sqrt((s{i}{i} - s{i} * s{i} / n)"
                    f" * (s{j}{j} - s{j} * s{j} / n))"
                )
                pair_rows.append(
                    f"SELECT '{a}' AS col_a, '{b}' AS col_b, {corr} AS corr FROM sums"
                )
    return (
        "WITH sums AS (SELECT " + ", ".join(terms) + " FROM lineitem)\n"
        + "\nUNION ALL ".join(pair_rows)
    )


@register("lineitem_correlation_matrix", _corr_sql())
def lineitem_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Pearson correlation matrix over the lineitem numerics in
    ONE pass: all Σx / Σx² / Σxy moments come from a single
    aggregation (14 exact decimal sums — partial-aggregatable, one
    scan, one 1-row exchange no matter how many columns), and the 6
    upper-triangle pairs are stack-unpivoted map-side. The
    feature-correlation screen an ML pipeline runs before training;
    at 100 TB the cost is identical to any single global aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = _CORR_COLS
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, c in enumerate(cols):
        aggs.append(_dsum(c).alias(f"s{i}"))
    for i, a in enumerate(cols):
        for j, b in enumerate(cols):
            if i <= j:
                pa = F.col(a).cast("decimal(19,4)")
                pb = F.col(b).cast("decimal(19,4)")
                aggs.append(
                    F.sum((pa * pb).cast("decimal(38,8)"))
                    .cast("string")
                    .cast("double")
                    .alias(f"s{i}{j}")
                )
    sums = li.agg(*aggs)
    n = F.col("n")
    stack_args = []
    for i, a in enumerate(cols):
        for j, b in enumerate(cols):
            if i < j:
                corr = (
                    f"(s{i}{j} - s{i} * s{j} / n)"
                    f" / sqrt((s{i}{i} - s{i} * s{i} / n)"
                    f" * (s{j}{j} - s{j} * s{j} / n))"
                )
                stack_args.append(f"'{a}', '{b}', {corr}")
    return sums.selectExpr(
        f"stack(6, {', '.join(stack_args)}) AS (col_a, col_b, corr)"
    )


@register(
    "lineitem_equidepth_histogram",
    """
    WITH r AS (
      SELECT l_extendedprice,
             NTILE(10) OVER (ORDER BY l_extendedprice,
                             l_orderkey, l_linenumber) AS bucket
      FROM lineitem
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           count(*) AS n_rows,
           min(l_extendedprice) AS lo,
           max(l_extendedprice) AS hi,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,4))) AS DOUBLE)
             / count(*) AS mean_price
    FROM r GROUP BY bucket
    """,
)
def lineitem_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (10 equal-count buckets with data-driven
    bounds — the optimizer-statistics / feature-binning shape, vs the
    fixed-bound equi-width histogram): NTILE(10) over price, computed
    by the TWO-PASS global ranking (range partition → local
    row_number + broadcast per-partition offsets → integer ntile
    arithmetic) so no single-reducer WindowExec appears at any scale;
    then one bucket aggregation for counts/bounds/exact means. The
    oracle runs SQL NTILE directly, pinning the two-pass integer
    reconstruction against the engine-native semantics."""
    from .ranking import ntile_from_rn, with_global_ranks

    li = load_table(spark, sf_dir, "lineitem")
    ranked = with_global_ranks(
        li.select("l_extendedprice", "l_orderkey", "l_linenumber"),
        key_order=[("l_extendedprice", "asc")],
        tie_order=[("l_orderkey", "asc"), ("l_linenumber", "asc")],
    )
    bucketed = ranked.withColumn(
        "bucket", ntile_from_rn(F.col("rn"), F.col("n_total"), 10)
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
        (
            F.sum(F.col("l_extendedprice").cast("decimal(27,4)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_price"),
    )


@register(
    "events_ab_ttest",
    f"""
    WITH per_user AS (
      SELECT user_id,
             user_id % 2 AS variant,
             CAST(CAST(SUM(CAST(value AS DECIMAL(27,4))) AS VARCHAR) AS DOUBLE) AS metric
      FROM events GROUP BY user_id
    ),
    sums AS (
      SELECT variant,
             count(*) AS n,
             CAST(CAST(SUM(CAST(metric AS DECIMAL(27,4))) AS VARCHAR) AS DOUBLE) AS s,
             CAST(CAST(SUM(CAST(CAST(metric AS DECIMAL(19,4)) * CAST(metric AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS ss
      FROM per_user GROUP BY variant
    ),
    stats AS (
      SELECT variant, n, s / n AS mean,
             (ss - s * s / n) / NULLIF(n - 1, 0) AS var
      FROM sums
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN variant = 0 THEN n END) AS n_a,
        MAX(CASE WHEN variant = 1 THEN n END) AS n_b,
        MAX(CASE WHEN variant = 0 THEN mean END) AS mean_a,
        MAX(CASE WHEN variant = 1 THEN mean END) AS mean_b,
        MAX(CASE WHEN variant = 0 THEN var END) AS var_a,
        MAX(CASE WHEN variant = 1 THEN var END) AS var_b
      FROM stats
    )
    SELECT n_a, n_b, mean_a, mean_b,
           (mean_a - mean_b) / NULLIF(sqrt(var_a / n_a + var_b / n_b), 0) AS t_stat,
           (var_a / n_a + var_b / n_b) * (var_a / n_a + var_b / n_b)
             / NULLIF((var_a / n_a) * (var_a / n_a) / NULLIF(n_a - 1, 0)
                + (var_b / n_b) * (var_b / n_b) / NULLIF(n_b - 1, 0), 0) AS welch_df
    FROM wide
    """,
)
def events_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test between experiment arms (the A/B
    readout the reference's loaded events table feeds downstream):
    users split into variants by ``user_id % 2`` (a deployment would
    hash the assignment key), per-user metric = exact DECIMAL revenue
    sum, then mean/variance per arm from exact sums (the
    ``agg_variance_from_sums`` moment formula) and the t statistic +
    Welch–Satterthwaite df as a fixed IEEE chain over identical
    inputs — reproducible bit-for-bit across engines, unlike native
    streaming variance.

    Scale: two partial-aggregatable passes (user rollup, then a
    2-group rollup) — no window, no join; the wide pivot is a 2-row
    conditional aggregation."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        _dsum("value").alias("metric")
    ).select(
        (F.col("user_id") % 2).alias("variant"), "metric"
    )
    sums = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum("metric").alias("s"),
        _dsum_sq("metric").alias("ss"),
    )
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    # NULLIF pins the degenerate corpora to NULL on BOTH engines (the
    # r14 single-user sweep find): a 1-user arm zeroes (n−1), and a
    # zero-variance pair zeroes the t/Welch denominators
    stats = sums.select(
        "variant",
        "n",
        (s / n).alias("mean"),
        ((ss - s * s / n) / F.nullif((n - 1).cast("double"), F.lit(0.0))).alias(
            "var"
        ),
    )

    def pick(col: str, variant: int):
        return F.max(F.when(F.col("variant") == variant, F.col(col)))

    wide = stats.agg(
        pick("n", 0).alias("n_a"), pick("n", 1).alias("n_b"),
        pick("mean", 0).alias("mean_a"), pick("mean", 1).alias("mean_b"),
        pick("var", 0).alias("var_a"), pick("var", 1).alias("var_b"),
    )
    se2_a = F.col("var_a") / F.col("n_a")
    se2_b = F.col("var_b") / F.col("n_b")
    se2 = se2_a + se2_b
    return wide.select(
        "n_a", "n_b", "mean_a", "mean_b",
        (
            (F.col("mean_a") - F.col("mean_b"))
            / F.nullif(F.sqrt(se2), F.lit(0.0))
        ).alias("t_stat"),
        (
            se2 * se2
            / F.nullif(
                se2_a * se2_a
                / F.nullif((F.col("n_a") - 1).cast("double"), F.lit(0.0))
                + se2_b * se2_b
                / F.nullif((F.col("n_b") - 1).cast("double"), F.lit(0.0)),
                F.lit(0.0),
            )
        ).alias("welch_df"),
    )


@register(
    "stats_median_ci",
    f"""
    WITH vals AS (
      SELECT event_type, value, CAST({_TS} AS DATE) AS day FROM events
    ),
    ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, day) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM vals
    ),
    bounds AS (
      SELECT event_type, n,
             CAST(ceil(0.5 * n) AS BIGINT) AS r_med,
             CAST(floor((n - CAST(1.959964 AS DOUBLE) * sqrt(CAST(n AS DOUBLE))) / 2) AS BIGINT) AS r_lo,
             CAST(ceil(1 + (n + CAST(1.959964 AS DOUBLE) * sqrt(CAST(n AS DOUBLE))) / 2) AS BIGINT) AS r_hi
      FROM ranked GROUP BY event_type, n
    )
    SELECT b.event_type, b.n,
           MIN(CASE WHEN r.rn = b.r_med THEN r.value END) AS median,
           MIN(CASE WHEN r.rn = b.r_lo THEN r.value END) AS ci_lo,
           MIN(CASE WHEN r.rn = b.r_hi THEN r.value END) AS ci_hi
    FROM bounds b JOIN ranked r ON r.event_type = b.event_type
    GROUP BY b.event_type, b.n
    """,
)
def stats_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free 95% confidence interval for the median via
    order statistics (the binomial/sign-test bound: P(X < m) = 1/2, so
    the CI is the values at ranks n/2 ∓ z·√n/2 — no normality
    assumption, no bootstrap RNG, fully deterministic). The quantity a
    dashboard should show next to any median at 100 TB: with n in the
    billions the interval collapses, with n=40/group it visibly does
    not.

    Plan: one row_number window PARTITIONED by event_type (never
    global; ties on value are rank-order-irrelevant — equal values
    yield the same order statistic either way), rank bounds from
    integer/sqrt arithmetic (z as an exact literal, identical on both
    engines), then a conditional aggregation picks the three order
    statistics in one pass. SCALE NOTE: event_type is low-cardinality,
    so this exact tier funnels each type through one reducer — at
    100 TB swap the ranking for the mergeable value-histogram walk
    (`events_mergeable_quantile_rollup`): the same three ranks fall
    out of the cumulative counts with no per-type total sort."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", F.to_date("ts"))
    wt = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    z = F.lit(1.959964).cast("double")
    sq = F.sqrt(F.col("n").cast("double"))
    bounds = ranked.groupBy("event_type", "n").agg(F.lit(1).alias("_one")).select(
        "event_type",
        "n",
        F.ceil(F.lit(0.5) * F.col("n")).cast("long").alias("r_med"),
        F.floor((F.col("n") - z * sq) / 2).cast("long").alias("r_lo"),
        F.ceil(1 + (F.col("n") + z * sq) / 2).cast("long").alias("r_hi"),
    )
    joined = bounds.alias("b").join(
        ranked.alias("r"), F.col("b.event_type") == F.col("r.event_type")
    )
    return joined.groupBy(F.col("b.event_type").alias("event_type"), F.col("b.n").alias("n")).agg(
        F.min(F.when(F.col("r.rn") == F.col("b.r_med"), F.col("r.value"))).alias("median"),
        F.min(F.when(F.col("r.rn") == F.col("b.r_lo"), F.col("r.value"))).alias("ci_lo"),
        F.min(F.when(F.col("r.rn") == F.col("b.r_hi"), F.col("r.value"))).alias("ci_hi"),
    )


@register(
    "stats_groupwise_ols",
    """
    WITH sums AS (
      SELECT l_returnflag,
             count(*) AS n,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,4))) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS syy,
             CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept,
           sy / n AS mean_y,
           ((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
    FROM sums
    """,
)
def stats_groupwise_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple linear regression (price ~ quantity) in closed
    form from exact sums — the grouped-trend primitive (MLlib would
    bring a solver; a 2-parameter OLS needs only the moment sums the
    variance/correlation entries already aggregate): slope =
    (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), intercept = ȳ − b·x̄, each ONE
    fixed IEEE chain over exact decimal sums. One partial-aggregated
    shuffle; at any scale the heavy work is the same one pass the
    mean would cost."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,4)")
    p = F.col("l_extendedprice").cast("decimal(18,4)")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum("l_quantity").alias("sx"),
        _dsum("l_extendedprice").alias("sy"),
        F.sum((q * q).cast("decimal(38,8)")).cast("string").cast("double").alias("sxx"),
        F.sum((p * p).cast("decimal(38,8)")).cast("string").cast("double").alias("syy"),
        F.sum((q * p).cast("decimal(38,8)")).cast("string").cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return sums.select(
        "l_returnflag",
        "n",
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
        (sy / n).alias("mean_y"),
        (
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("r2"),
    )


@register(
    "stats_weighted_median",
    """
    WITH wv AS (
      SELECT l_returnflag, l_extendedprice AS value,
             SUM(CAST(l_quantity AS DECIMAL(27,4))) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    cum AS (
      SELECT l_returnflag, value,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY value
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM wv
    )
    SELECT l_returnflag,
           CAST(CAST(MAX(tw) AS VARCHAR) AS DOUBLE) AS total_weight,
           MIN(CASE WHEN cw * 2 >= tw THEN value END) AS weighted_median,
           MIN(CASE WHEN cw * 10 >= tw * 9 THEN value END) AS weighted_p90
    FROM cum GROUP BY l_returnflag
    """,
)
def stats_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median / weighted p90 of price with quantity as the
    weight (the 'median unit sold at this price' question — a plain
    median over rows answers a different one): per-(group, value)
    exact decimal weight states, then a cumulative-weight walk picks
    the smallest value covering half (resp. 90%) of the total weight.
    Quantile boundaries compare DECIMALS scaled by integers (cw·2 ≥
    tw, cw·10 ≥ 9·tw) — exact, no float boundary flip. Same mergeable
    two-level shape as events_mergeable_quantile_rollup; the window
    partitions by group over distinct values."""
    li = load_table(spark, sf_dir, "lineitem")
    wv = li.groupBy(
        "l_returnflag", F.col("l_extendedprice").alias("value")
    ).agg(F.sum(F.col("l_quantity").cast("decimal(27,4)")).alias("w"))
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("l_returnflag")
    cum = wv.select(
        "l_returnflag",
        "value",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_tot).alias("tw"),
    )
    return cum.groupBy("l_returnflag").agg(
        F.max("tw").cast("string").cast("double").alias("total_weight"),
        F.min(
            F.when(F.col("cw") * 2 >= F.col("tw"), F.col("value"))
        ).alias("weighted_median"),
        F.min(
            F.when(F.col("cw") * 10 >= F.col("tw") * 9, F.col("value"))
        ).alias("weighted_p90"),
    )


@register(
    "events_did_estimator",
    """
    WITH e AS (
      SELECT user_id % 2 AS treated,
             CASE WHEN CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT)
                       <= (SELECT (CAST(epoch_us(min(CAST(ts AS TIMESTAMP))) AS BIGINT)
                                   + CAST(epoch_us(max(CAST(ts AS TIMESTAMP))) AS BIGINT)) // 2
                           FROM events WHERE user_id IS NOT NULL)
                  THEN 0 ELSE 1 END AS period,
             value
      FROM events WHERE user_id IS NOT NULL
    ),
    cells AS (
      SELECT treated, period,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(27,4))) AS VARCHAR)
                  AS DOUBLE) AS s
      FROM e GROUP BY treated, period
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN treated = 0 AND period = 0 THEN n END) AS n_c_pre,
        MAX(CASE WHEN treated = 0 AND period = 1 THEN n END) AS n_c_post,
        MAX(CASE WHEN treated = 1 AND period = 0 THEN n END) AS n_t_pre,
        MAX(CASE WHEN treated = 1 AND period = 1 THEN n END) AS n_t_post,
        MAX(CASE WHEN treated = 0 AND period = 0 THEN s END) AS s_c_pre,
        MAX(CASE WHEN treated = 0 AND period = 1 THEN s END) AS s_c_post,
        MAX(CASE WHEN treated = 1 AND period = 0 THEN s END) AS s_t_pre,
        MAX(CASE WHEN treated = 1 AND period = 1 THEN s END) AS s_t_post
      FROM cells
    )
    SELECT n_c_pre, n_c_post, n_t_pre, n_t_post,
           s_c_pre / n_c_pre AS mean_c_pre,
           s_c_post / n_c_post AS mean_c_post,
           s_t_pre / n_t_pre AS mean_t_pre,
           s_t_post / n_t_post AS mean_t_post,
           s_c_post / n_c_post - s_c_pre / n_c_pre AS delta_control,
           s_t_post / n_t_post - s_t_pre / n_t_pre AS delta_treated,
           (s_t_post / n_t_post - s_t_pre / n_t_pre)
             - (s_c_post / n_c_post - s_c_pre / n_c_pre) AS did
    FROM wide
    """,
)
def events_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences — the workhorse causal estimator the
    experimentation suite lacked (ab_ttest / proportion-ztest test
    LEVELS; DiD removes arm-constant and time-constant confounding by
    differencing both): arms by ``user_id % 2`` (the house assignment
    key), pre/post split at the data horizon's µs midpoint (the
    rfm_migration idiom, one 1-row scalar), cell means from exact
    DECIMAL sums via the string-round-trip double (the _dsum
    discipline), and DiD = (post−pre)_treated − (post−pre)_control as
    one fixed IEEE chain over identical inputs on both engines.

    Scale: one partial-aggregatable pass to 4 cells + a 4-row pivot —
    no window, no join; the midpoint scalar broadcasts."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    bounds = e.agg(
        F.expr(
            "CAST((CAST(min(unix_micros(ts)) AS BIGINT)"
            " + CAST(max(unix_micros(ts)) AS BIGINT)) div 2 AS BIGINT)"
        ).alias("mid_us")
    )
    cells = (
        e.crossJoin(F.broadcast(bounds))
        .groupBy(
            (F.col("user_id") % 2).alias("treated"),
            F.when(F.unix_micros("ts") <= F.col("mid_us"), 0)
            .otherwise(1)
            .alias("period"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            _dsum("value").alias("s"),
        )
    )

    def pick(col: str, t: int, p: int):
        return F.max(
            F.when((F.col("treated") == t) & (F.col("period") == p), F.col(col))
        )

    wide = cells.agg(
        pick("n", 0, 0).alias("n_c_pre"), pick("n", 0, 1).alias("n_c_post"),
        pick("n", 1, 0).alias("n_t_pre"), pick("n", 1, 1).alias("n_t_post"),
        pick("s", 0, 0).alias("s_c_pre"), pick("s", 0, 1).alias("s_c_post"),
        pick("s", 1, 0).alias("s_t_pre"), pick("s", 1, 1).alias("s_t_post"),
    )
    m_c_pre = F.col("s_c_pre") / F.col("n_c_pre")
    m_c_post = F.col("s_c_post") / F.col("n_c_post")
    m_t_pre = F.col("s_t_pre") / F.col("n_t_pre")
    m_t_post = F.col("s_t_post") / F.col("n_t_post")
    return wide.select(
        "n_c_pre", "n_c_post", "n_t_pre", "n_t_post",
        m_c_pre.alias("mean_c_pre"),
        m_c_post.alias("mean_c_post"),
        m_t_pre.alias("mean_t_pre"),
        m_t_post.alias("mean_t_post"),
        (m_c_post - m_c_pre).alias("delta_control"),
        (m_t_post - m_t_pre).alias("delta_treated"),
        ((m_t_post - m_t_pre) - (m_c_post - m_c_pre)).alias("did"),
    )


@register(
    "events_cuped_adjustment",
    """
    WITH mid AS (
      SELECT (CAST(epoch_us(min(CAST(ts AS TIMESTAMP))) AS BIGINT)
              + CAST(epoch_us(max(CAST(ts AS TIMESTAMP))) AS BIGINT)) // 2
               AS mid_us
      FROM events WHERE user_id IS NOT NULL
    ),
    per_user AS (
      SELECT user_id, user_id % 2 AS arm,
             CAST(CAST(COALESCE(SUM(CASE
                    WHEN CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT)
                         <= m.mid_us
                    THEN CAST(value AS DECIMAL(27,4)) END), 0) AS VARCHAR)
                  AS DOUBLE) AS x,
             CAST(CAST(COALESCE(SUM(CASE
                    WHEN CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT)
                         > m.mid_us
                    THEN CAST(value AS DECIMAL(27,4)) END), 0) AS VARCHAR)
                  AS DOUBLE) AS y
      FROM events, mid m WHERE user_id IS NOT NULL
      GROUP BY user_id
    ),
    arms AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(x AS DECIMAL(27,4))) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(y AS DECIMAL(27,4))) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(CAST(x AS DECIMAL(19,4)) * CAST(x AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(CAST(x AS DECIMAL(19,4)) * CAST(y AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS sxy,
             CAST(CAST(SUM(CAST(CAST(y AS DECIMAL(19,4)) * CAST(y AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS syy
      FROM per_user GROUP BY arm
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN arm = 0 THEN n END) AS n_a,
        MAX(CASE WHEN arm = 1 THEN n END) AS n_b,
        MAX(CASE WHEN arm = 0 THEN sx END) AS sx_a,
        MAX(CASE WHEN arm = 1 THEN sx END) AS sx_b,
        MAX(CASE WHEN arm = 0 THEN sy END) AS sy_a,
        MAX(CASE WHEN arm = 1 THEN sy END) AS sy_b,
        MAX(CASE WHEN arm = 0 THEN sxx END) + MAX(CASE WHEN arm = 1 THEN sxx END) AS sxx,
        MAX(CASE WHEN arm = 0 THEN sxy END) + MAX(CASE WHEN arm = 1 THEN sxy END) AS sxy,
        MAX(CASE WHEN arm = 0 THEN syy END) + MAX(CASE WHEN arm = 1 THEN syy END) AS syy
      FROM arms
    ),
    calc AS (
      SELECT n_a, n_b, sx_a, sx_b, sy_a, sy_b, sxx, sxy, syy,
             n_a + n_b AS n,
             sx_a + sx_b AS sx,
             sy_a + sy_b AS sy
      FROM wide
    )
    SELECT n_a, n_b,
           (sxy - sx * sy / n) / NULLIF(sxx - sx * sx / n, 0) AS theta,
           (sxy - sx * sy / n) * (sxy - sx * sy / n)
             / NULLIF((sxx - sx * sx / n) * (syy - sy * sy / n), 0) AS rho_sq,
           sy_a / n_a - sy_b / n_b AS raw_diff,
           (sy_a / n_a - sy_b / n_b)
             - (sxy - sx * sy / n) / NULLIF(sxx - sx * sx / n, 0)
               * (sx_a / n_a - sx_b / n_b) AS adjusted_diff
    FROM calc
    """,
)
def events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM'13) — the modern
    experimentation workhorse the A/B suite was missing: the
    pre-period covariate X (per-user revenue before the horizon
    midpoint) absorbs between-user variance from the post-period
    metric Y; θ = cov(X,Y)/var(X) pooled over arms, the adjusted
    treatment effect is (Ȳ_a − Ȳ_b) − θ(X̄_a − X̄_b), and ρ² reports
    the variance fraction removed. Every moment comes from exact
    DECIMAL sums via the string-round-trip double (the
    agg_correlation_from_sums discipline), so θ/ρ²/diffs are single
    fixed IEEE chains over identical inputs on both engines.

    Scale: one events pass to per-user (x, y) + one 2-group moment
    rollup — no window, no join beyond the 1-row midpoint scalar."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    bounds = e.agg(
        F.expr(
            "CAST((CAST(min(unix_micros(ts)) AS BIGINT)"
            " + CAST(max(unix_micros(ts)) AS BIGINT)) div 2 AS BIGINT)"
        ).alias("mid_us")
    )
    dec = F.col("value").cast("decimal(27,4)")
    per_user = (
        e.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.unix_micros("ts") <= F.col("mid_us"), dec)),
                F.lit(0).cast("decimal(27,4)"),
            )
            .cast("string")
            .cast("double")
            .alias("x"),
            F.coalesce(
                F.sum(F.when(F.unix_micros("ts") > F.col("mid_us"), dec)),
                F.lit(0).cast("decimal(27,4)"),
            )
            .cast("string")
            .cast("double")
            .alias("y"),
        )
        .select((F.col("user_id") % 2).alias("arm"), "x", "y")
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        _dsum("x").alias("sx"),
        _dsum("y").alias("sy"),
        _dsum_sq("x").alias("sxx"),
        F.sum(
            (F.col("x").cast("decimal(19,4)") * F.col("y").cast("decimal(19,4)"))
            .cast("decimal(38,8)")
        )
        .cast("string")
        .cast("double")
        .alias("sxy"),
        _dsum_sq("y").alias("syy"),
    )

    def pick(col: str, a: int):
        return F.max(F.when(F.col("arm") == a, F.col(col)))

    wide = arms.agg(
        pick("n", 0).alias("n_a"), pick("n", 1).alias("n_b"),
        pick("sx", 0).alias("sx_a"), pick("sx", 1).alias("sx_b"),
        pick("sy", 0).alias("sy_a"), pick("sy", 1).alias("sy_b"),
        (pick("sxx", 0) + pick("sxx", 1)).alias("sxx"),
        (pick("sxy", 0) + pick("sxy", 1)).alias("sxy"),
        (pick("syy", 0) + pick("syy", 1)).alias("syy"),
    )
    n = (F.col("n_a") + F.col("n_b")).cast("double")
    sx = F.col("sx_a") + F.col("sx_b")
    sy = F.col("sy_a") + F.col("sy_b")
    cov = F.col("sxy") - sx * sy / n
    varx = F.col("sxx") - sx * sx / n
    vary = F.col("syy") - sy * sy / n
    # NULLIF pins the degenerate corpora to NULL on BOTH engines (the
    # r14 constant-timestamp sweep find): a zero-variance covariate or
    # post-period (every event on one side of the midpoint) zeroes
    # var(X)·var(Y), and a single user zeroes var(X) itself
    theta = cov / F.nullif(varx, F.lit(0.0))
    mean_dx = F.col("sx_a") / F.col("n_a") - F.col("sx_b") / F.col("n_b")
    raw = F.col("sy_a") / F.col("n_a") - F.col("sy_b") / F.col("n_b")
    return wide.select(
        "n_a",
        "n_b",
        theta.alias("theta"),
        (cov * cov / F.nullif(varx * vary, F.lit(0.0))).alias("rho_sq"),
        raw.alias("raw_diff"),
        (raw - theta * mean_dx).alias("adjusted_diff"),
    )


WILSON_Z_VAL = "1.959963984540054"  # z_{0.975}
# decimal literals parse as DECIMAL in DuckDB — force DOUBLE so the
# CI chain is the same IEEE arithmetic on both engines
WILSON_Z = f"CAST({WILSON_Z_VAL} AS DOUBLE)"


@register(
    "events_wilson_ci",
    f"""
    WITH counts AS (
      SELECT event_type,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(COUNT(DISTINCT CASE WHEN value > 50 THEN user_id END)
                  AS BIGINT) AS n_converted
      FROM events WHERE user_id IS NOT NULL
      GROUP BY event_type
    )
    SELECT event_type, n_users, n_converted,
           CAST(n_converted AS DOUBLE) / n_users AS rate,
           (2 * CAST(n_converted AS DOUBLE) + {WILSON_Z} * {WILSON_Z}
              - {WILSON_Z} * sqrt(
                  (4 * CAST(n_converted AS DOUBLE)
                     * CAST(n_users - n_converted AS DOUBLE)
                   + {WILSON_Z} * {WILSON_Z} * CAST(n_users AS DOUBLE))
                  / CAST(n_users AS DOUBLE)))
             / (2 * (CAST(n_users AS DOUBLE) + {WILSON_Z} * {WILSON_Z}))
             AS ci_low,
           (2 * CAST(n_converted AS DOUBLE) + {WILSON_Z} * {WILSON_Z}
              + {WILSON_Z} * sqrt(
                  (4 * CAST(n_converted AS DOUBLE)
                     * CAST(n_users - n_converted AS DOUBLE)
                   + {WILSON_Z} * {WILSON_Z} * CAST(n_users AS DOUBLE))
                  / CAST(n_users AS DOUBLE)))
             / (2 * (CAST(n_users AS DOUBLE) + {WILSON_Z} * {WILSON_Z}))
             AS ci_high
    FROM counts
    """,
)
def events_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson-score 95% interval for per-type user conversion rates
    (converted = any event with value > 50) — the binomial CI that
    stays inside [0,1] and behaves at small n where the normal
    approximation fails; the experiment-readout companion to the
    z-test entries. The interval is a single deterministic IEEE chain
    over two exact integers (n, k) with z as a shared literal — both
    engines compute sqrt of the identical double, so the bounds
    hash-match (the registry's transcendental-aggregate exemption:
    integer inputs, one fixed chain).

    Scale: one distinct-user aggregation per type; the math is
    per-row over the vocabulary-sized frame."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    counts = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.countDistinct(
            F.when(F.col("value") > 50, F.col("user_id"))
        )
        .cast("long")
        .alias("n_converted"),
    )
    z = float(WILSON_Z_VAL)
    n = F.col("n_users").cast("double")
    k = F.col("n_converted").cast("double")
    nk = (F.col("n_users") - F.col("n_converted")).cast("double")
    # 2n-scaled Wilson form: sqrt argument built from EXACT-integer
    # doubles (4k(n-k) + z^2 n)/n, one short shared IEEE chain — the
    # p-hat-based long form diverged by 1 ulp between engines
    zz = F.lit(z) * F.lit(z)
    s_arg = (F.lit(4) * k * nk + zz * n) / n
    half = F.lit(z) * F.sqrt(s_arg)
    center = F.lit(2) * k + zz
    denom = F.lit(2) * (n + zz)
    return counts.select(
        "event_type",
        "n_users",
        "n_converted",
        (k / n).alias("rate"),
        ((center - half) / denom).alias("ci_low"),
        ((center + half) / denom).alias("ci_high"),
    )
