"""Composed analytics over the events stream: cohort retention,
event-sequence transitions, key-skew profiling — the downstream
queries the reference's loaded ``application_events`` table exists to
serve (README.md:... "analytics events"), each a small composition of
the operator library."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

_TS = "CAST(ts AS TIMESTAMP)"


@register(
    "cohort_retention",
    f"""
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('week', min({_TS})) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', {_TS}) AS DATE) AS active_week
      FROM events
    )
    SELECT f.cohort_week,
           CAST((a.active_week - f.cohort_week) // 7 AS BIGINT) AS week_offset,
           count(DISTINCT a.user_id) AS n_active
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week,
    counted per week-offset of later activity. Two aggregations and
    an unhinted join on the per-user firsts table — |users| scales
    with the data, so the strategy is left to AQE (broadcast small,
    shuffle large; both sides already share the user_id exchange)."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("active_week")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "event_transition_matrix",
    f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY {_TS}, event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-sequence transition counts (the Markov-chain
    input for funnel/journey analysis): one window on user_id + one
    aggregation, both sharing the same partitioning."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "key_skew_profile",
    """
    WITH per_key AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ),
    totals AS (SELECT count(*) AS total FROM events)
    SELECT count(*) AS n_keys,
           max(n) AS max_key_rows,
           min(n) AS min_key_rows,
           CAST(SUM(CAST(n AS DECIMAL(27,0))) AS DOUBLE) / count(*) AS mean_key_rows,
           max(n) / (SELECT total FROM totals) AS max_key_share
    FROM per_key
    """,
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-key skew diagnostics: per-key cardinality extremes
    and the hot key's share of all rows — the number that decides
    whether a groupBy/join on this key needs salting (operators.skew)
    before it runs at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    per_key = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    total = e.count()
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_key_rows"),
        F.min("n").alias("min_key_rows"),
        (F.sum(F.col("n").cast("decimal(27,0)")).cast("double") / F.count(F.lit(1))).alias("mean_key_rows"),
        (F.max("n") / F.lit(total)).alias("max_key_share"),
    )


@register(
    "rfm_segmentation",
    f"""
    WITH base AS (
      SELECT user_id,
             CAST(epoch_us(max({_TS})) AS BIGINT) AS recency_us,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS monetary
      FROM events
      WHERE event_type = 'purchase'
      GROUP BY user_id
    )
    SELECT user_id, recency_us, frequency, monetary,
           CAST(ntile(4) OVER (ORDER BY recency_us DESC, user_id) AS BIGINT) AS r_score,
           CAST(ntile(4) OVER (ORDER BY frequency DESC, user_id) AS BIGINT) AS f_score,
           CAST(ntile(4) OVER (ORDER BY monetary DESC, user_id) AS BIGINT) AS m_score
    FROM base
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation over purchase events: per-user
    recency (µs of last purchase), frequency, monetary (exact DECIMAL
    sum), each quartile-scored with ntile(4). 1 = best quartile
    (most recent / most frequent / highest spend); ties broken by
    user_id so both engines assign identical scores.

    Plan: one partial-aggregated shuffle on user_id, then each score
    comes from the TWO-PASS global ranking (operators/ranking.py:
    range-repartition → partition-local row_number → broadcast prefix
    offsets) with ntile derived from the exact (rn, N) integers — no
    unpartitioned window anywhere, so the |users|-sized frame never
    lands on a single reducer. The three score frames join back on
    user_id (already the frame's key)."""
    from .ranking import ntile_from_rn, with_global_ranks

    e = load_table(spark, sf_dir, "events")
    # persisted: three ranking branches plus the final join all read
    # this frame — without the cache each branch would re-scan the raw
    # events and redo the aggregation (7 scans measured), which at
    # 100 TB means reading the fact table seven times for one query.
    # The per-user aggregate is ~5 orders of magnitude smaller than
    # the input; eviction is left to Spark's LRU.
    base = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.unix_micros("ts")).alias("recency_us"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("value").cast("decimal(27,4)")).cast("double").alias("monetary"),
        )
        .persist()
    )

    def score(metric: str, alias: str) -> DataFrame:
        ranked = with_global_ranks(
            base.select("user_id", metric),
            key_order=[(metric, "desc")],
            tie_order=[("user_id", "asc")],
        )
        return ranked.select(
            "user_id", ntile_from_rn(F.col("rn"), F.col("n_total"), 4).alias(alias)
        )

    return (
        base.join(score("recency_us", "r_score"), "user_id")
        .join(score("frequency", "f_score"), "user_id")
        .join(score("monetary", "m_score"), "user_id")
        .select(
            "user_id", "recency_us", "frequency", "monetary",
            "r_score", "f_score", "m_score",
        )
    )


@register(
    "user_feature_matrix",
    f"""
    SELECT user_id,
           CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
           CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
           CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
           CAST(count(DISTINCT CAST({_TS} AS DATE)) AS BIGINT) AS n_active_days,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(value AS DECIMAL(27,4))
                         ELSE CAST(0 AS DECIMAL(27,4)) END) AS DOUBLE) AS total_spend
    FROM events GROUP BY user_id
    """,
)
def user_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user wide feature vector (event-type counts, active days,
    exact spend) — the feature-engineering aggregation an ML pipeline
    runs before training on behavioral data. One partial-aggregated
    shuffle on user_id; conditional counts stay map-side; the
    distinct-days count is the only two-phase aggregate."""
    e = load_table(spark, sf_dir, "events")
    cnt = lambda t: F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")  # noqa: E731
    return e.groupBy("user_id").agg(
        cnt("click"),
        cnt("view"),
        cnt("purchase"),
        cnt("signup"),
        F.countDistinct(F.col("ts").cast("date")).alias("n_active_days"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase", F.col("value").cast("decimal(27,4)")
            ).otherwise(F.lit(0).cast("decimal(27,4)"))
        )
        .cast("double")
        .alias("total_spend"),
    )


@register(
    "active_user_rollups",
    f"""
    WITH days AS (
      SELECT DISTINCT CAST({_TS} AS DATE) AS day FROM events
    ),
    user_days AS (
      SELECT DISTINCT user_id, CAST({_TS} AS DATE) AS day FROM events
    )
    SELECT d.day,
           count(DISTINCT CASE WHEN u.day = d.day THEN u.user_id END) AS dau,
           count(DISTINCT CASE WHEN u.day > d.day - 7 THEN u.user_id END) AS wau,
           count(DISTINCT u.user_id) AS mau
    FROM days d JOIN user_days u
      ON u.day <= d.day AND u.day > d.day - 30
    GROUP BY d.day
    """,
)
def active_user_rollups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / MAU per calendar day — the canonical engagement
    rollup. Pre-aggregates to DISTINCT (user, day) first (one shuffle
    that shrinks the fact table to its active-pair sliver), then a
    range join against the day spine (30 rows per active pair max)
    with conditional distinct counts per window length. The day spine
    is |days| rows — broadcast by AQE unhinted; at 100 TB the
    user_days sliver is the only scaling side and it shuffles once."""
    e = load_table(spark, sf_dir, "events")
    days = e.select(F.col("ts").cast("date").alias("day")).distinct()
    user_days = e.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    d, u = days.alias("d"), user_days.alias("u")
    return (
        d.join(
            u,
            (F.col("u.day") <= F.col("d.day"))
            & (F.col("u.day") > F.date_sub(F.col("d.day"), 30)),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(
            F.countDistinct(
                F.when(F.col("u.day") == F.col("d.day"), F.col("u.user_id"))
            ).alias("dau"),
            F.countDistinct(
                F.when(F.col("u.day") > F.date_sub(F.col("d.day"), 7), F.col("u.user_id"))
            ).alias("wau"),
            F.countDistinct("u.user_id").alias("mau"),
        )
    )


@register(
    "events_wow_growth",
    f"""
    WITH weekly AS (
      SELECT CAST(date_trunc('week', {_TS}) AS DATE) AS week,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1
    )
    SELECT week, n_events, total_value,
           lag(n_events) OVER (ORDER BY week) AS prev_events,
           (n_events - lag(n_events) OVER (ORDER BY week))
             / CAST(lag(n_events) OVER (ORDER BY week) AS DOUBLE) AS wow_growth
    FROM weekly
    """,
)
def events_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth: weekly exact aggregates, then one lag
    window over the |weeks|-sized frame (a constant-bounded frame —
    52 rows/year — so the single-partition window is legitimate, the
    same exemption as ranking.py's per-partition stats table)."""
    e = load_table(spark, sf_dir, "events")
    weekly = e.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("week")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(27,4)")).cast("double").alias("total_value"),
    )
    w = Window.orderBy("week")
    return weekly.select(
        "week",
        "n_events",
        "total_value",
        F.lag("n_events").over(w).alias("prev_events"),
        (
            (F.col("n_events") - F.lag("n_events").over(w))
            / F.lag("n_events").over(w).cast("double")
        ).alias("wow_growth"),
    )


@register(
    "events_hourly_seasonality",
    f"""
    SELECT CAST(extract(hour FROM {_TS}) AS BIGINT) AS hour_of_day,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) / count(*) AS avg_value
    FROM events GROUP BY 1
    """,
)
def events_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile (24-row output): one
    partial-aggregated shuffle; the average is the exact-DECIMAL-sum
    davg shape (one final IEEE division)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(F.hour("ts").cast("long").alias("hour_of_day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum(F.col("value").cast("decimal(27,4)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_value"),
    )


@register("events_hll_rolling_users", None)  # Spark HLL binary: no DuckDB twin
def events_hll_rolling_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting — the incremental-rollup
    pattern exact countDistinct cannot do at 100 TB: per-day HLL
    sketches are built ONCE (one narrow agg over each day's
    partition), then any date range's distinct-user estimate is a
    UNION of the daily sketches — no rescan of history, and the union
    is associative so yesterday's sketches never recompute. Output:
    per-week distinct estimates from daily sketches next to the day
    count. Rows-only for the driver (Spark's HLL binary has no DuckDB
    twin); the error-bound and mergeability contracts are pinned in
    tests/test_temporal_stats_ops.py."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("week"),
        F.to_date("ts").alias("day"),
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        daily.groupBy("week")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
        )
        .select("week", "n_days", F.col("est_users").cast("long").alias("est_users"))
    )


@register("events_approx_topk_rollup", None)  # sketch state: no DuckDB twin
def events_approx_topk_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable approximate top-k heavy hitters (Spark 4's
    approx_top_k sketch family): per-day sketch states are built ONCE
    (`approx_top_k_accumulate`), any range's heavy hitters come from
    `approx_top_k_combine` over the daily states — the same
    incremental-rollup shape as the HLL entry, for the "most frequent
    items" question. No history rescan: yesterday's states never
    recompute, and the combine is associative. Output explodes the
    weekly estimate into (week, item, est_count) rows (scalar columns
    only). Rows-only for the driver; exactness on a small key space
    and merge-vs-direct parity are pinned in
    tests/test_temporal_stats_ops.py."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("week"),
        F.to_date("ts").alias("day"),
    ).agg(F.expr("approx_top_k_accumulate(event_type, 10)").alias("state"))
    weekly = daily.groupBy("week").agg(
        F.expr("approx_top_k_estimate(approx_top_k_combine(state, 10), 10)").alias("top")
    )
    return weekly.select(
        "week", F.explode("top").alias("t")
    ).select(
        "week",
        F.col("t.item").alias("item"),
        F.col("t.count").cast("long").alias("est_count"),
    )


@register(
    "events_mergeable_daily_rollup",
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('week', {_TS}) AS DATE) AS week,
             CAST({_TS} AS DATE) AS day, event_type,
             count(*) AS n,
             SUM(CAST(value AS DECIMAL(27,4))) AS sum_value,
             min(value) AS min_value, max(value) AS max_value
      FROM events GROUP BY 1, 2, 3
    )
    SELECT week, event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(CAST(sum(sum_value) AS DECIMAL(27,4)) AS DOUBLE) AS sum_value,
           min(min_value) AS min_value,
           max(max_value) AS max_value,
           CAST(CAST(sum(sum_value) AS DECIMAL(27,4)) AS DOUBLE) / sum(n) AS avg_value
    FROM daily GROUP BY week, event_type
    """,
)
def events_mergeable_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact mergeable-partial rollup — the incremental materialized-
    view pattern: per-(day, type) partial states (count, exact DECIMAL
    sum, min, max) are built once; weekly aggregates — including the
    average, derived as merged-sum/merged-count — are computed ONLY by
    merging partials, never rescanning events. The oracle computes the
    same numbers from the raw table, so the hash match PROVES the
    partial-merge algebra (counts add, decimal sums add, min/max
    compose, avg = Σsum/Σn) is lossless. At 100 TB this is the
    difference between an O(day) nightly update and an O(history)
    rescan; same shape as the HLL/top-k sketch entries but exact."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("week"),
        F.to_date("ts").alias("day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(27,4)")).alias("sum_value_dec"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    merged_sum = F.sum("sum_value_dec").cast("decimal(27,4)")
    return daily.groupBy("week", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("n").cast("long").alias("n_events"),
        merged_sum.cast("double").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
        (merged_sum.cast("double") / F.sum("n")).alias("avg_value"),
    )


# Fixed logistic-regression weights for the scoring demo (a trained
# model's coefficients are deployment constants — broadcast literals,
# never data). Exact decimal-string literals parse to identical
# doubles in both engines.
_LR_WEIGHTS = {
    "n_click": "0.02",
    "n_view": "-0.01",
    "n_purchase": "0.3",
    "n_signup": "0.5",
    "n_active_days": "0.05",
    "total_spend": "0.001",
}
_LR_BIAS = "-2.5"


@register(
    "ml_linear_score_users",
    f"""
    WITH feat AS (
      SELECT user_id,
             count(*) FILTER (WHERE event_type = 'click') AS n_click,
             count(*) FILTER (WHERE event_type = 'view') AS n_view,
             count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
             count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
             count(DISTINCT CAST({_TS} AS DATE)) AS n_active_days,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(value AS DECIMAL(27,4))
                           ELSE CAST(0 AS DECIMAL(27,4)) END) AS DOUBLE)
               AS total_spend
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    )
    SELECT user_id,
           CAST({_LR_BIAS} AS DOUBLE)
             {' '.join(f"+ CAST({w} AS DOUBLE) * {c}" for c, w in _LR_WEIGHTS.items())}
             AS score,
           CASE WHEN CAST({_LR_BIAS} AS DOUBLE)
             {' '.join(f"+ CAST({w} AS DOUBLE) * {c}" for c, w in _LR_WEIGHTS.items())}
             > 0 THEN 1 ELSE 0 END AS predicted
    FROM feat
    """,
)
def ml_linear_score_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch model scoring, JVM-side: a trained linear model's
    coefficients applied to the per-user feature aggregation as ONE
    fixed-order arithmetic expression — no Python in the scoring
    path, no model server round-trips; at 100 TB this is a map-side
    pass over the feature shuffle. The linear score is a monotone
    transform of the logistic probability, so thresholding z > 0 IS
    thresholding sigmoid(z) > 0.5 without evaluating exp (whose JVM
    vs libm rounding differs by 1 ulp — the score stays bit-exact
    across engines)."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    cnt = lambda t: F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")  # noqa: E731
    feat = e.groupBy("user_id").agg(
        cnt("click"),
        cnt("view"),
        cnt("purchase"),
        cnt("signup"),
        F.countDistinct(F.col("ts").cast("date")).alias("n_active_days"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase", F.col("value").cast("decimal(27,4)")
            ).otherwise(F.lit(0).cast("decimal(27,4)"))
        )
        .cast("double")
        .alias("total_spend"),
    )
    score = F.expr(
        f"CAST({_LR_BIAS} AS DOUBLE) "
        + " ".join(f"+ CAST({w} AS DOUBLE) * {c}" for c, w in _LR_WEIGHTS.items())
    )
    return feat.select(
        "user_id",
        score.alias("score"),
        F.when(score > 0, 1).otherwise(0).alias("predicted"),
    )


@register(
    "event_second_order_transitions",
    f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER w AS next1,
             LEAD(event_type, 2) OVER w AS next2
      FROM events WHERE user_id IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY {_TS}, event_id)
    )
    SELECT event_type AS t0, next1 AS t1, next2 AS t2, count(*) AS n
    FROM seq WHERE next2 IS NOT NULL
    GROUP BY 1, 2, 3
    """,
)
def event_second_order_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order Markov transition counts (trigram of events): the
    sequence-mining depth first-order transitions can't see (is
    view→click→purchase different from click→view→purchase?). The
    SAME single user_id exchange as the first-order op — both LEADs
    share one window sort — then a partial-aggregated count."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            F.col("event_type").alias("t0"),
            F.lead("event_type").over(w).alias("t1"),
            F.lead("event_type", 2).over(w).alias("t2"),
        )
        .where(F.col("t2").isNotNull())
        .groupBy("t0", "t1", "t2")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "funnel_ordered_steps",
    f"""
    WITH base AS (
      SELECT user_id, {_TS} AS tsx, event_type
      FROM events WHERE user_id IS NOT NULL
    ),
    w1 AS (
      SELECT *, min(CASE WHEN event_type = 'signup' THEN tsx END)
                  OVER (PARTITION BY user_id) AS t1
      FROM base
    ),
    w2 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND tsx > t1 THEN tsx END)
                  OVER (PARTITION BY user_id) AS t2
      FROM w1
    ),
    w3 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND tsx > t2 THEN tsx END)
                  OVER (PARTITION BY user_id) AS t3
      FROM w2
    )
    SELECT user_id,
           epoch_us(min(t1)) AS signup_us,
           epoch_us(min(t2)) AS first_click_after_us,
           epoch_us(min(t3)) AS first_purchase_after_us,
           CASE WHEN min(t3) IS NOT NULL THEN 1 ELSE 0 END AS converted
    FROM w3 GROUP BY user_id
    """,
)
def funnel_ordered_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRICT-ORDER funnel (signup → later click → later purchase):
    each step's timestamp must follow the previous step's, which the
    unordered `funnel_conversion` counts cannot express. Three full-
    frame window minimums chained on the SAME user_id partitioning —
    each step's threshold is the previous window's result — so the
    fact shuffles once no matter how many funnel stages are added;
    the final per-user collapse reuses the same exchange."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    staged = e.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t3", t3)
    return staged.groupBy("user_id").agg(
        F.unix_micros(F.min("t1")).alias("signup_us"),
        F.unix_micros(F.min("t2")).alias("first_click_after_us"),
        F.unix_micros(F.min("t3")).alias("first_purchase_after_us"),
        F.when(F.min("t3").isNotNull(), 1).otherwise(0).alias("converted"),
    )


@register(
    "attribution_position_credit",
    f"""
    WITH purchases AS (
      SELECT user_id, {_TS} AS p_ts, event_id AS purchase_id
      FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
    ),
    touches AS (
      SELECT p.purchase_id, e.event_type AS channel, {_TS.replace('ts', 'e.ts')} AS t_ts,
             e.event_id
      FROM purchases p JOIN events e
        ON e.user_id = p.user_id
       AND e.event_type IN ('click', 'view')
       AND CAST(e.ts AS TIMESTAMP) < p.p_ts
       AND CAST(e.ts AS TIMESTAMP) >= p.p_ts - INTERVAL 1 DAY
    ),
    ranked AS (
      SELECT purchase_id, channel,
             ROW_NUMBER() OVER (PARTITION BY purchase_id
                                ORDER BY t_ts, event_id) AS rn_first,
             ROW_NUMBER() OVER (PARTITION BY purchase_id
                                ORDER BY t_ts DESC, event_id DESC) AS rn_last,
             count(*) OVER (PARTITION BY purchase_id) AS n_touch
      FROM touches
    ),
    credited AS (
      SELECT purchase_id, channel,
             CASE WHEN n_touch = 1 THEN CAST(1 AS DOUBLE)
                  WHEN n_touch = 2 THEN CAST(0.5 AS DOUBLE)
                  WHEN rn_first = 1 THEN CAST(0.4 AS DOUBLE)
                  WHEN rn_last = 1 THEN CAST(0.4 AS DOUBLE)
                  ELSE CAST(0.2 AS DOUBLE) / (n_touch - 2) END AS credit
      FROM ranked
    )
    SELECT channel,
           CAST(SUM(CAST(credit AS DECIMAL(27,12))) AS DOUBLE) AS total_credit,
           count(*) AS n_touches
    FROM credited GROUP BY channel
    """,
)
def attribution_position_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped, 40/20/40) marketing attribution:
    each purchase's last-day click/view touches share credit — 40%
    to first touch, 40% to last, the middle 20% split evenly (the
    standard multi-touch model between last-click and Shapley).
    Touch discovery is the range join; credit assignment is two
    row_numbers + a count over the SAME purchase_id partitioning
    (one exchange); per-touch credits are deterministic divisions
    summed in exact decimal."""
    e = load_table(spark, sf_dir, "events")
    p = e.where(
        (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
    ).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    t = e.where(F.col("event_type").isin("click", "view")).select(
        "user_id", F.col("event_type").alias("channel"), F.col("ts").alias("t_ts"),
        "event_id",
    )
    touches = p.join(
        t,
        (t.user_id == p.p_user)
        & (t.t_ts < p.p_ts)
        & (t.t_ts >= p.p_ts - F.expr("INTERVAL 1 DAY")),
    ).select("purchase_id", "channel", "t_ts", "event_id")
    wf = Window.partitionBy("purchase_id").orderBy("t_ts", "event_id")
    wl = Window.partitionBy("purchase_id").orderBy(
        F.desc("t_ts"), F.desc("event_id")
    )
    wc = Window.partitionBy("purchase_id")
    ranked = touches.select(
        "purchase_id",
        "channel",
        F.row_number().over(wf).alias("rn_first"),
        F.row_number().over(wl).alias("rn_last"),
        F.count(F.lit(1)).over(wc).alias("n_touch"),
    )
    credit = (
        F.when(F.col("n_touch") == 1, F.lit(1.0))
        .when(F.col("n_touch") == 2, F.lit(0.5))
        .when(F.col("rn_first") == 1, F.lit(0.4))
        .when(F.col("rn_last") == 1, F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n_touch") - 2))
    )
    return (
        ranked.withColumn("credit", credit)
        .groupBy("channel")
        .agg(
            F.sum(F.col("credit").cast("decimal(27,12)"))
            .cast("double")
            .alias("total_credit"),
            F.count(F.lit(1)).alias("n_touches"),
        )
    )


@register(
    "events_mergeable_quantile_rollup",
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('week', {_TS}) AS DATE) AS week,
             CAST({_TS} AS DATE) AS day, value, count(*) AS n
      FROM events GROUP BY 1, 2, 3
    ),
    wk AS (
      SELECT week, list(value ORDER BY value) AS vals, CAST(count(*) AS BIGINT) AS n_events
      FROM (
        SELECT week, value, sum(n) AS cnt FROM daily GROUP BY week, value
      ), LATERAL unnest(generate_series(1, CAST(cnt AS INTEGER))) AS g(i)
      GROUP BY week
    )
    SELECT week, n_events,
           vals[CAST(ceil(0.5 * n_events) AS INTEGER)] AS p50_value,
           vals[CAST(ceil(0.9 * n_events) AS INTEGER)] AS p90_value
    FROM wk
    """,
)
def events_mergeable_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable quantiles — the value-histogram twin of
    ``events_mergeable_daily_rollup``: per-(day, value) count states
    are built once; a week's p50/p90 is answered ONLY by merging
    daily states (counts add by value) and walking the cumulative
    count to rank ceil(q·N) — discrete-percentile semantics, no raw
    rescan. The oracle materializes each week's fully expanded sorted
    value list from the raw table and indexes it directly, so the
    hash match proves the state merge + cumulative-rank walk equals
    the definitional quantile.

    Scale: state size is |distinct values| per day — for metrics with
    bounded domains (latency ms buckets, prices in cents) this is the
    standard exact incremental-quantile design; for unbounded
    continuous domains you quantize the value first and the same
    algebra gives ε-approximate quantiles with ε = grid step. The
    per-week cumulative walk windows over distinct values WITHIN a
    week partition (never a global window)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("week"),
        F.to_date("ts").alias("day"),
        "value",
    ).agg(F.count(F.lit(1)).alias("n"))
    merged = daily.groupBy("week", "value").agg(F.sum("n").alias("n"))
    w_cum = (
        Window.partitionBy("week")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("week")
    cum = merged.select(
        "week",
        "value",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_tot).alias("n_events"),
    )
    return cum.groupBy("week").agg(
        F.max("n_events").cast("long").alias("n_events"),
        F.min(
            F.when(F.col("cum") >= F.ceil(F.lit(0.5) * F.col("n_events")), F.col("value"))
        ).alias("p50_value"),
        F.min(
            F.when(F.col("cum") >= F.ceil(F.lit(0.9) * F.col("n_events")), F.col("value"))
        ).alias("p90_value"),
    )


_HS_FEATS = """
    feats AS (
      SELECT user_id,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x1,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS x2,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS x3,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0
                  THEN 1 ELSE 0 END AS y
      FROM events GROUP BY user_id
    ),
    nn AS (SELECT COUNT(*) AS n FROM feats)
"""
_HS_Z = "(w.w_bias + w.w_n_click*x1 + w.w_n_view*x2 + w.w_n_error*x3)"
_HS_ZQ = (
    f"(CASE WHEN {_HS_Z} >= 0 THEN {_HS_Z} // 4"
    f" ELSE -((-{_HS_Z}) // 4) END)"
)


def _hs_oracle(scale: int, epochs: int, lr_den: int) -> str:
    p = f"GREATEST(0, LEAST({scale}, {scale // 2} + {_HS_ZQ}))"
    r = f"(y * {scale} - {p})"
    div = f"({lr_den} * GREATEST((SELECT n FROM nn), 1))"

    def upd(xc: str) -> str:
        g = f"coalesce((SELECT SUM({r} * {xc}) FROM feats), 0)"
        return (
            f"CAST(CASE WHEN {g} >= 0 THEN {g} // {div}"
            f" ELSE -((-{g}) // {div}) END AS BIGINT)"
        )

    return f"""
    WITH RECURSIVE {_HS_FEATS},
    w (epoch, w_bias, w_n_click, w_n_view, w_n_error) AS (
      SELECT 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      UNION ALL
      SELECT w.epoch + 1,
             w.w_bias + {upd('1')},
             w.w_n_click + {upd('x1')},
             w.w_n_view + {upd('x2')},
             w.w_n_error + {upd('x3')}
      FROM w WHERE w.epoch < {epochs}
    )
    SELECT CAST(epoch AS BIGINT) AS epoch,
           w_bias, w_n_click, w_n_view, w_n_error,
           CAST((SELECT COUNT(*) FROM feats
                 WHERE (CASE WHEN 2 * {p} >= {scale} THEN 1 ELSE 0 END) = y)
                AS BIGINT) AS n_correct
    FROM w
    """


from .ml import HS_EPOCHS, HS_LR_DEN, HS_SCALE  # noqa: E402


@register("ml_logreg_train", _hs_oracle(HS_SCALE, HS_EPOCHS, HS_LR_DEN))
def ml_logreg_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN the logistic model ml_linear_score_users consumes:
    predict whether a user purchases from their click/view/error
    activity. r12 (r11 verdict item 2): converted rows-only → HASH
    ORACLE by the ml_perceptron_train precedent — gradient descent
    with the hard-sigmoid activation in exact fixed-point BIGINT
    arithmetic (see operators/ml.py:logreg_train_hardsigmoid), so the
    DuckDB twin replays all 8 residual-proportional updates
    bit-for-bit as a recursive CTE. The float-σ variant remains as
    ml.logreg_train with its NumPy-parity pytest (tests/test_ml.py);
    this registered entry now hash-checks the logistic UPDATE
    semantics (y ∈ {0,1}, residual-proportional — the piece the
    sign-based perceptron entry does not cover)."""
    from .ml import logreg_train_hardsigmoid

    e = load_table(spark, sf_dir, "events")
    feats = e.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "click").cast("long").alias("n_click"),
        F.count_if(F.col("event_type") == "view").cast("long").alias("n_view"),
        F.count_if(F.col("event_type") == "error").cast("long").alias("n_error"),
        (F.count_if(F.col("event_type") == "purchase") > 0)
        .cast("long")
        .alias("purchased"),
    )
    return logreg_train_hardsigmoid(
        feats, ["n_click", "n_view", "n_error"], "purchased"
    )


PERCEPTRON_EPOCHS = 8
_PERC_FEATS = """
    feats AS (
      SELECT user_id,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x1,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS x2,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS x3,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0
                  THEN 1 ELSE -1 END AS y
      FROM events GROUP BY user_id
    )
"""
_PERC_MARGIN = "(w.w_bias + w.w_n_click*x1 + w.w_n_view*x2 + w.w_n_error*x3)"


@register(
    "ml_perceptron_train",
    f"""
    WITH RECURSIVE {_PERC_FEATS},
    w (epoch, w_bias, w_n_click, w_n_view, w_n_error) AS (
      SELECT 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      UNION ALL
      SELECT w.epoch + 1,
             w.w_bias + coalesce((SELECT SUM(y) FROM feats
                                  WHERE y * {_PERC_MARGIN} <= 0), 0),
             w.w_n_click + coalesce((SELECT SUM(y * x1) FROM feats
                                     WHERE y * {_PERC_MARGIN} <= 0), 0),
             w.w_n_view + coalesce((SELECT SUM(y * x2) FROM feats
                                    WHERE y * {_PERC_MARGIN} <= 0), 0),
             w.w_n_error + coalesce((SELECT SUM(y * x3) FROM feats
                                     WHERE y * {_PERC_MARGIN} <= 0), 0)
      FROM w WHERE w.epoch < {PERCEPTRON_EPOCHS}
    )
    SELECT CAST(epoch AS BIGINT) AS epoch, w_bias, w_n_click, w_n_view, w_n_error,
           (SELECT COUNT(*) FROM feats
            WHERE y * {_PERC_MARGIN} <= 0) AS n_mis
    FROM w
    """,
)
def ml_perceptron_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-perceptron training over the same per-user activity
    features as ml_logreg_train, but with EXACT INTEGER arithmetic —
    the in-engine training tier's hash-oracle member (the fixed-point
    pagerank/HITS pattern applied to model fitting). The output is the
    full per-epoch trajectory (weights + error count), and the DuckDB
    twin replays all 8 updates bit-for-bit as a recursive CTE whose
    working table carries the weight vector, with the misclassified
    sums as correlated aggregates (the graph_kcore oracle shape).
    Exact pure-Python parity additionally pytest-pinned."""
    from .ml import perceptron_train

    e = load_table(spark, sf_dir, "events")
    feats = e.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "click").cast("long").alias("n_click"),
        F.count_if(F.col("event_type") == "view").cast("long").alias("n_view"),
        F.count_if(F.col("event_type") == "error").cast("long").alias("n_error"),
        F.when(F.count_if(F.col("event_type") == "purchase") > 0, 1)
        .otherwise(-1)
        .cast("long")
        .alias("label"),
    )
    return perceptron_train(
        feats, ["n_click", "n_view", "n_error"], "label", n_epochs=PERCEPTRON_EPOCHS
    )


@register(
    "events_trend_seasonal_decompose",
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
    )
    SELECT f.event_type, f.day, CAST(f.n AS BIGINT) AS n,
           CAST(f.sum7 AS DOUBLE) / CAST(7 AS DOUBLE) AS trend,
           s.seasonal,
           (CAST(f.n AS DOUBLE) - CAST(f.sum7 AS DOUBLE) / CAST(7 AS DOUBLE)) - s.seasonal
             AS remainder
    FROM full_win f JOIN seasonal s
      ON f.event_type = s.event_type AND f.weekday = s.weekday
    """,
)
def events_trend_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive time-series decomposition (the moving-
    average STL ancestor): per event type, trend = 7-day centered
    moving average of daily counts, seasonal = day-of-week mean of
    the detrended series, remainder = the rest. Edge days without a
    full 7-day window are dropped (a centered MA is undefined there).

    Exact-arithmetic design: the windowed sum and count are integers;
    detrended×7 = 7n − Σ7 stays integer, so the day-of-week seasonal
    mean is ONE double division of integer sums and every output
    column is a fixed short IEEE chain — no double accumulation
    anywhere, hash-exact across engines.

    Scale: daily rollup is one partial-aggregated shuffle; the MA
    window partitions by event_type over calendar-bounded frames
    (|days| rows per type); the seasonal join is a 7-rows-per-type
    frame — AQE broadcasts it."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w7 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    win = daily.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(w7).alias("sum7"),
        F.count(F.lit(1)).over(w7).alias("cnt7"),
    ).where(F.col("cnt7") == 7)
    full_win = win.select(
        "event_type",
        "day",
        "n",
        F.pmod(F.datediff("day", F.lit("1970-01-05").cast("date")), F.lit(7))
        .cast("long")
        .alias("weekday"),
        "sum7",
        (F.lit(7) * F.col("n") - F.col("sum7")).cast("long").alias("detr7"),
    )
    seasonal = full_win.groupBy("event_type", "weekday").agg(
        (
            F.sum("detr7").cast("double")
            / (F.lit(7) * F.count(F.lit(1))).cast("double")
        ).alias("seasonal")
    )
    trend = F.col("sum7").cast("double") / F.lit(7).cast("double")
    return full_win.join(seasonal, ["event_type", "weekday"]).select(
        "event_type",
        "day",
        F.col("n").cast("long").alias("n"),
        trend.alias("trend"),
        "seasonal",
        ((F.col("n").cast("double") - trend) - F.col("seasonal")).alias("remainder"),
    )


@register(
    "orders_pareto_customers",
    """
    WITH per AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS rev
      FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT SUM(rev) AS trev FROM per),
    c AS (
      SELECT o_custkey, rev,
             CAST(ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey) AS BIGINT) AS rn,
             SUM(rev) OVER (ORDER BY rev DESC, o_custkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS crev
      FROM per
    )
    SELECT c.o_custkey,
           CAST(CAST(c.rev AS VARCHAR) AS DOUBLE) AS revenue,
           c.rn,
           CAST(CAST(c.crev AS VARCHAR) AS DOUBLE)
             / CAST(CAST(t.trev AS VARCHAR) AS DOUBLE) AS cum_share,
           CAST(CAST(c.crev AS VARCHAR) AS DOUBLE)
             / CAST(CAST(t.trev AS VARCHAR) AS DOUBLE) <= 0.8 AS in_top80
    FROM c, tot t
    """,
)
def orders_pareto_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) revenue-concentration analysis: customers
    ranked by exact decimal revenue with their cumulative share of
    the total — the 'which 20% of customers carry 80% of revenue'
    readout. The running total comes from the TWO-PASS distributed
    cumulative sum (ranking.with_global_cumsum: range partition →
    partition-local decimal cumsum → broadcast per-partition sum
    offsets), so no |customers|-sized frame ever funnels through one
    reducer; exactness makes the running total independent of
    partitioning. The share and the 80% flag derive from the same
    double on both engines (identical digit-string conversions →
    identical division → identical comparison)."""
    from .ranking import with_global_cumsum

    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(27,4)")).alias("rev")
    )
    c = with_global_cumsum(
        per,
        key_order=[("rev", "desc")],
        tie_order=[("o_custkey", "asc")],
        sum_col="rev",
    )
    share = (
        F.col("cum_sum").cast("string").cast("double")
        / F.col("total_sum").cast("string").cast("double")
    )
    return c.select(
        "o_custkey",
        F.col("rev").cast("string").cast("double").alias("revenue"),
        "rn",
        share.alias("cum_share"),
        (share <= 0.8).alias("in_top80"),
    )


@register(
    "events_lag_features",
    f"""
    WITH daily AS (
      SELECT event_type, CAST({_TS} AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, CAST(n AS BIGINT) AS n,
           CAST(LAG(n, 1) OVER w AS BIGINT) AS lag_1,
           CAST(LAG(n, 7) OVER w AS BIGINT) AS lag_7,
           CAST(COUNT(*) OVER w7 AS BIGINT) AS n_prior_days,
           CAST(SUM(n) OVER w7 AS DOUBLE) / COUNT(*) OVER w7 AS mean_7_prior,
           CAST(n - LAG(n, 1) OVER w AS BIGINT) AS delta_1
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day),
           w7 AS (PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    """,
)
def events_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting feature engineering: per-(type, day) lag-1 / lag-7
    counts, the trailing-7-day mean computed STRICTLY from prior days
    (frame ends at −1 — using the current row would leak the target
    into its own feature), and the day-over-day delta. Integer counts
    + one division; windows partition by event_type over
    calendar-bounded frames. The (features, target) matrix a
    gradient-boosted or the in-engine logistic trainer consumes."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    w7 = w.rowsBetween(-7, -1)
    return daily.select(
        "event_type",
        "day",
        F.col("n").cast("long").alias("n"),
        F.lag("n", 1).over(w).cast("long").alias("lag_1"),
        F.lag("n", 7).over(w).cast("long").alias("lag_7"),
        F.count(F.lit(1)).over(w7).cast("long").alias("n_prior_days"),
        (F.sum("n").over(w7).cast("double") / F.count(F.lit(1)).over(w7)).alias(
            "mean_7_prior"
        ),
        (F.col("n") - F.lag("n", 1).over(w)).cast("long").alias("delta_1"),
    )


@register(
    "events_forecast_baseline_eval",
    f"""
    WITH daily AS (
      SELECT event_type, CAST({_TS} AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    feat AS (
      SELECT event_type, n,
             LAG(n, 1) OVER w AS lag_1,
             CASE WHEN COUNT(*) OVER w7 = 7
                  THEN SUM(n) OVER w7 ELSE NULL END AS sum_7
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day),
             w7 AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    ),
    scored AS (SELECT * FROM feat WHERE lag_1 IS NOT NULL AND sum_7 IS NOT NULL)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days_scored,
           CAST(SUM(ABS(n - lag_1)) AS DOUBLE) / count(*) AS mae_lag1,
           CAST(SUM(ABS(7 * n - sum_7)) AS DOUBLE) / (7 * count(*)) AS mae_mean7
    FROM scored GROUP BY event_type
    """,
)
def events_forecast_baseline_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine BACKTEST of the two standard forecasting baselines —
    persistence (ŷ = lag-1) and the strict-prior 7-day mean — scored
    by MAE per event type. The mean-7 error is computed in INTEGERS:
    |n − Σ7/7| = |7n − Σ7|/7, so the aggregate is an exact integer sum
    with ONE final division (averaging per-day float errors would be
    order-dependent). Only days where BOTH baselines are defined
    score, so the MAEs are comparable. This is the model-selection
    readout that says whether a fancier model beats persistence at
    all — the first question of any forecasting project."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    w7 = w.rowsBetween(-7, -1)
    feat = daily.select(
        "event_type",
        "n",
        F.lag("n", 1).over(w).alias("lag_1"),
        F.when(F.count(F.lit(1)).over(w7) == 7, F.sum("n").over(w7)).alias("sum_7"),
    ).where(F.col("lag_1").isNotNull() & F.col("sum_7").isNotNull())
    return feat.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days_scored"),
        (
            F.sum(F.abs(F.col("n") - F.col("lag_1"))).cast("double")
            / F.count(F.lit(1))
        ).alias("mae_lag1"),
        (
            F.sum(F.abs(F.lit(7) * F.col("n") - F.col("sum_7"))).cast("double")
            / (F.lit(7) * F.count(F.lit(1)))
        ).alias("mae_mean7"),
    )


@register(
    "events_dau_mau_stickiness",
    f"""
    WITH days AS (SELECT DISTINCT CAST({_TS} AS DATE) AS day FROM events),
    activity AS (
      SELECT DISTINCT user_id, CAST({_TS} AS DATE) AS active_day FROM events
    ),
    dau AS (SELECT active_day AS day, count(*) AS dau FROM activity GROUP BY 1),
    mau AS (
      SELECT d.day, count(DISTINCT a.user_id) AS mau
      FROM days d JOIN activity a
        ON a.active_day > d.day - 30 AND a.active_day <= d.day
      GROUP BY d.day
    )
    SELECT d.day, CAST(dau.dau AS BIGINT) AS dau, CAST(mau.mau AS BIGINT) AS mau,
           CAST(dau.dau AS DOUBLE) / mau.mau AS stickiness
    FROM days d JOIN dau ON dau.day = d.day JOIN mau ON mau.day = d.day
    """,
)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day — the engagement-quality ratio on
    top of the active_user_rollups machinery: DAU from the per-day
    distinct sliver; the trailing-30-day MAU via a range join of the
    day spine against per-(user, day) activity — only the distinct
    (user, day) sliver fans out (bounded ×30), never raw events. One
    division per day.

    Scale: the range join is the documented interval decomposition —
    at 100 TB you'd precompute daily HLL sketches and union 30 of
    them (events_hll_rolling_users); this entry is the exact tier."""
    e = load_table(spark, sf_dir, "events")
    # persisted (user, day) distinct sliver: four consumers (day
    # spine, DAU, MAU range join, final) re-scanned events otherwise
    activity = e.select(
        "user_id", F.to_date("ts").alias("active_day")
    ).distinct().persist()
    days = activity.select(F.col("active_day").alias("day")).distinct()
    dau = activity.groupBy(F.col("active_day").alias("day")).agg(
        F.count(F.lit(1)).alias("dau")
    )
    mau = (
        days.join(
            activity,
            (F.col("active_day") > F.date_sub(F.col("day"), 30))
            & (F.col("active_day") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("mau"))
    )
    return (
        days.join(dau, "day")
        .join(mau, "day")
        .select(
            "day",
            F.col("dau").cast("long").alias("dau"),
            F.col("mau").cast("long").alias("mau"),
            (F.col("dau").cast("double") / F.col("mau")).alias("stickiness"),
        )
    )


@register(
    "orders_interarrival_stats",
    """
    WITH seq AS (
      SELECT o_custkey,
             datediff('day', LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                                    ORDER BY o_orderdate, o_orderkey),
                      o_orderdate) AS gap_days
      FROM orders
    ),
    gaps AS (SELECT o_custkey, gap_days FROM seq WHERE gap_days IS NOT NULL)
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(min(gap_days) AS BIGINT) AS min_gap_days,
           CAST(max(gap_days) AS BIGINT) AS max_gap_days,
           CAST(SUM(gap_days) AS DOUBLE) / count(*) AS mean_gap_days
    FROM gaps GROUP BY o_custkey
    """,
)
def orders_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order inter-arrival statistics (the cadence
    behind churn/next-purchase models): one lag window on the
    customer partition, integer day gaps, exact integer sums with one
    final division. Customers with a single order have no gap and
    drop out (their cadence is undefined, not zero)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.select(
            "o_custkey",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lag(F.col("o_orderdate").cast("date")).over(w),
            ).alias("gap_days"),
        )
        .where(F.col("gap_days").isNotNull())
    )
    return gaps.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.min("gap_days").cast("long").alias("min_gap_days"),
        F.max("gap_days").cast("long").alias("max_gap_days"),
        (F.sum("gap_days").cast("double") / F.count(F.lit(1))).alias("mean_gap_days"),
    )


@register(
    "events_user_gini",
    """
    WITH per_user AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT n, CAST(ROW_NUMBER() OVER (ORDER BY n, user_id) AS BIGINT) AS rn
      FROM per_user
    ),
    sums AS (
      SELECT count(*) AS n_users,
             CAST(SUM(n) AS BIGINT) AS total,
             CAST(SUM(rn * n) AS BIGINT) AS weighted
      FROM ranked
    )
    SELECT n_users, total,
           CAST(2 * weighted AS DOUBLE) / (CAST(n_users AS DOUBLE) * total)
             - CAST(n_users + 1 AS DOUBLE) / n_users AS gini
    FROM sums
    """,
)
def events_user_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user activity — the concentration
    scalar next to the Pareto curve (0 = everyone equally active,
    →1 = one user is the workload): G = 2Σ(rank·x)/(n·Σx) − (n+1)/n
    over counts ranked ascending. The rank comes from the TWO-PASS
    global ranking (no single-reducer window over users); Σ(rank·x)
    and Σx are exact integer sums, and the result is two divisions.
    Also the key-skew planning number: a high Gini on the join key
    says salt before shuffling at 100 TB."""
    from .ranking import with_global_ranks

    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    ranked = with_global_ranks(
        per_user,
        key_order=[("n", "asc")],
        tie_order=[("user_id", "asc")],
    )
    sums = ranked.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n").cast("long").alias("total"),
        F.sum(F.col("rn") * F.col("n")).cast("long").alias("weighted"),
    )
    return sums.select(
        "n_users",
        "total",
        (
            (F.lit(2) * F.col("weighted")).cast("double")
            / (F.col("n_users").cast("double") * F.col("total"))
            - (F.col("n_users") + 1).cast("double") / F.col("n_users")
        ).alias("gini"),
    )


# --- decision-stump training (histogram split search) ----------------

# Shared formula TEXT for the stump entry: Spark parses these via
# F.expr and DuckDB runs them verbatim, so both engines execute the
# byte-identical arithmetic — the strongest form of the house
# bit-exact discipline (no hand-mirrored expression trees to drift).
# Binning: double division by 1000.0 of an exactly-converted decimal;
# boundaries land exactly on multiples of 1000 (1000·k / 1000.0 is
# IEEE-exact) and non-boundary values sit ≥ 1e-2/1000 = 1e-5 away —
# orders of magnitude beyond double ulp, so FLOOR never straddles.
_STUMP_BIN = "CAST(FLOOR(CAST(o_totalprice AS DOUBLE) / 1000.0) AS BIGINT)"
_STUMP_Y = "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END"


def _stump_wgini_sql() -> str:
    """Weighted Gini of the (x < threshold) split over columns
    nl/pl/nr/pr/n_tot — every division an explicit CAST-to-DOUBLE of
    exact integers, one fixed chain."""

    def gini(p: str, n: str) -> str:
        fp = f"(CAST({p} AS DOUBLE) / CAST({n} AS DOUBLE))"
        fq = f"(CAST({n} - {p} AS DOUBLE) / CAST({n} AS DOUBLE))"
        return f"(1.0 - {fp} * {fp} - {fq} * {fq})"

    return (
        f"(CAST(nl AS DOUBLE) / CAST(n_tot AS DOUBLE)) * {gini('pl', 'nl')}"
        f" + (CAST(nr AS DOUBLE) / CAST(n_tot AS DOUBLE)) * {gini('pr', 'nr')}"
    )


@register(
    "ml_decision_stump_train",
    f"""
    WITH binned AS (
      SELECT {_STUMP_BIN} AS bin, {_STUMP_Y} AS y FROM orders
    ),
    bins AS (
      SELECT bin, COUNT(*) AS n, SUM(y) AS pos FROM binned GROUP BY bin
    ),
    cum AS (
      SELECT (bin + 1) * 1000 AS threshold,
             SUM(n) OVER (ORDER BY bin) AS nl,
             SUM(pos) OVER (ORDER BY bin) AS pl,
             SUM(n) OVER () AS n_tot,
             SUM(pos) OVER () AS p_tot
      FROM bins
    ),
    cand AS (
      SELECT threshold, nl, pl, n_tot - nl AS nr, p_tot - pl AS pr, n_tot
      FROM cum WHERE n_tot - nl > 0
    ),
    scored AS (
      SELECT threshold, nl, pl, nr, pr,
             {_stump_wgini_sql()} AS wgini
      FROM cand
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY wgini, threshold) AS rank
      FROM scored
    )
    SELECT CAST(threshold AS BIGINT) AS threshold, CAST(nl AS BIGINT) AS nl,
           CAST(pl AS BIGINT) AS pl, CAST(nr AS BIGINT) AS nr,
           CAST(pr AS BIGINT) AS pr, wgini, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def ml_decision_stump_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-1 decision tree (stump) trained by exhaustive histogram
    split search: predict order status = 'F' from o_totalprice. The
    LightGBM-style scale shape — features pre-bin into a BOUNDED
    histogram (here $1000 bins), so the split search is one groupBy
    over |bins| rows + cumulative windows over the tiny histogram, no
    per-row candidate explosion and no data-sized shuffle regardless
    of table size. Emits the 10 best (threshold, split counts,
    weighted Gini) candidates; the Gini arithmetic is the SAME formula
    text parsed by both engines (F.expr = oracle SQL), so doubles are
    bit-equal. Pure-Python parity in tests/test_ml.py."""
    o = load_table(spark, sf_dir, "orders")
    bins = (
        o.select(F.expr(_STUMP_BIN).alias("bin"), F.expr(_STUMP_Y).alias("y"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos"))
    )
    # unpartitioned windows are safe HERE: the frame is the bounded
    # bin histogram (≤ ~60 rows), not the data
    w_cum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cand = (
        bins.select(
            ((F.col("bin") + 1) * 1000).alias("threshold"),
            F.sum("n").over(w_cum).alias("nl"),
            F.sum("pos").over(w_cum).alias("pl"),
            F.sum("n").over(w_all).alias("n_tot"),
            F.sum("pos").over(w_all).alias("p_tot"),
        )
        .withColumn("nr", F.col("n_tot") - F.col("nl"))
        .withColumn("pr", F.col("p_tot") - F.col("pl"))
        .where(F.col("nr") > 0)
    )
    ranked = (
        cand.withColumn("wgini", F.expr(_stump_wgini_sql()))
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("wgini").asc(), F.col("threshold").asc()))
            .cast("long"),
        )
        .where(F.col("rank") <= 10)
    )
    return ranked.select("threshold", "nl", "pl", "nr", "pr", "wgini", "rank")


# --- window-constrained funnel -----------------------------------------

FUNNEL_WINDOW_HOURS = 24  # max gap allowed between consecutive steps


@register(
    "funnel_window_constrained",
    f"""
    WITH base AS (
      SELECT user_id, {_TS} AS tsx, event_type
      FROM events WHERE user_id IS NOT NULL
    ),
    w1 AS (
      SELECT *, min(CASE WHEN event_type = 'signup' THEN tsx END)
                  OVER (PARTITION BY user_id) AS t1
      FROM base
    ),
    w2 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND tsx > t1
                          AND tsx <= t1 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
                     THEN tsx END)
                  OVER (PARTITION BY user_id) AS t2
      FROM w1
    ),
    w3 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND tsx > t2
                          AND tsx <= t2 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
                     THEN tsx END)
                  OVER (PARTITION BY user_id) AS t3
      FROM w2
    ),
    per_user AS (
      SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
      FROM w3 GROUP BY user_id
    )
    SELECT CAST(COUNT(t1) AS BIGINT) AS n_signup,
           CAST(COUNT(t2) AS BIGINT) AS n_click_in_window,
           CAST(COUNT(t3) AS BIGINT) AS n_purchase_in_window,
           CAST(COUNT(t2) AS DOUBLE) / NULLIF(CAST(COUNT(t1) AS DOUBLE), 0)
             AS step2_rate,
           CAST(COUNT(t3) AS DOUBLE) / NULLIF(CAST(COUNT(t2) AS DOUBLE), 0)
             AS step3_rate,
           CAST(COUNT(t3) AS DOUBLE) / NULLIF(CAST(COUNT(t1) AS DOUBLE), 0)
             AS full_rate
    FROM per_user
    """,
)
def funnel_window_constrained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONVERSION-WINDOW funnel: signup → click within 24 h → purchase
    within 24 h of the click — the product-analytics semantics the
    strict-order entry cannot express (a purchase a month later is
    retention, not funnel conversion). Same physical shape as
    funnel_ordered_steps: chained window minimums on ONE user_id
    exchange, each step's predicate adding the upper window bound;
    the final report is a 1-row fold of integer counts with three
    single divisions. Window arithmetic (t + INTERVAL) is exact µs
    both engines."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id")
    gap = F.expr(f"INTERVAL {FUNNEL_WINDOW_HOURS} HOUR")
    staged = e.withColumn(
        "t1",
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
    )
    staged = staged.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("t1"))
                & (F.col("ts") <= F.col("t1") + gap),
                F.col("ts"),
            )
        ).over(w),
    )
    staged = staged.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t2"))
                & (F.col("ts") <= F.col("t2") + gap),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = staged.groupBy("user_id").agg(
        F.min("t1").alias("t1"), F.min("t2").alias("t2"), F.min("t3").alias("t3")
    )
    # NULLIF pins the zero-traffic / no-step corpus to NULL on both
    # engines — Spark ANSI would throw DIVIDE_BY_ZERO (r13 empty-
    # corpus sweep find)
    def _rate(num, den):
        return num.cast("double") / F.nullif(den.cast("double"), F.lit(0.0))

    return per_user.agg(
        F.count("t1").alias("n_signup"),
        F.count("t2").alias("n_click_in_window"),
        F.count("t3").alias("n_purchase_in_window"),
        _rate(F.count("t2"), F.count("t1")).alias("step2_rate"),
        _rate(F.count("t3"), F.count("t2")).alias("step3_rate"),
        _rate(F.count("t3"), F.count("t1")).alias("full_rate"),
    )


@register(
    "rfm_migration",
    f"""
    WITH p AS (
      SELECT user_id, {_TS} AS tsx, CAST(value AS DECIMAL(27,4)) AS v
      FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
    ),
    bounds AS (
      SELECT (CAST(epoch_us(min(tsx)) AS BIGINT)
              + CAST(epoch_us(max(tsx)) AS BIGINT)) // 2 AS mid_us
      FROM p
    ),
    per AS (
      SELECT user_id,
             CASE WHEN CAST(epoch_us(tsx) AS BIGINT) <= b.mid_us
                  THEN 0 ELSE 1 END AS period,
             CAST(SUM(v) AS DOUBLE) AS monetary
      FROM p, bounds b
      GROUP BY 1, 2
    ),
    tiers AS (
      SELECT user_id, period,
             CAST(ntile(4) OVER (PARTITION BY period
                                 ORDER BY monetary DESC, user_id)
                  AS BIGINT) AS tier
      FROM per
    )
    SELECT COALESCE(e.tier, 0) AS early_tier,
           COALESCE(l.tier, 0) AS late_tier,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM (SELECT user_id, tier FROM tiers WHERE period = 0) e
    FULL OUTER JOIN (SELECT user_id, tier FROM tiers WHERE period = 1) l
      ON l.user_id = e.user_id
    GROUP BY 1, 2
    """,
)
def rfm_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-tier MIGRATION matrix: spend quartile in the
    early half of the purchase horizon vs the late half (midpoint =
    integer mean of the min/max purchase µs — one 1-row scalar), with
    tier 0 meaning absent from that period — so the (0, t) row is
    acquisition and (t, 0) is churn, the lifecycle view the static
    rfm_segmentation snapshot cannot express. Quartiles per period via
    the TWO-PASS global ranking + integer ntile (no single-reducer
    window; same discipline and tie-break as rfm_segmentation), run
    once per period exactly like rfm's per-metric scores; the final
    matrix is a full outer join of two |users|-sized tier frames
    folded to ≤ 24 integer cells."""
    from .ranking import ntile_from_rn, with_global_ranks

    e = load_table(spark, sf_dir, "events")
    p = e.where(
        (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
    ).select("user_id", "ts", F.col("value").cast("decimal(27,4)").alias("v"))
    bounds = p.agg(
        (
            (F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts")))
            / F.lit(2)
        )
        .cast("long")
        .alias("mid_us")
    )
    # 1-row scalar broadcast (house pattern; allowlisted)
    per = (
        p.crossJoin(F.broadcast(bounds))
        .groupBy(
            "user_id",
            F.when(F.unix_micros("ts") <= F.col("mid_us"), 0)
            .otherwise(1)
            .alias("period"),
        )
        .agg(F.sum("v").cast("double").alias("monetary"))
        .persist()
    )

    def tiers_for(period: int) -> DataFrame:
        f = per.where(F.col("period") == period).select("user_id", "monetary")
        ranked = with_global_ranks(
            f,
            key_order=[("monetary", "desc")],
            tie_order=[("user_id", "asc")],
        )
        return ranked.select(
            "user_id",
            ntile_from_rn(F.col("rn"), F.col("n_total"), 4).alias("tier"),
        )

    early = tiers_for(0).select(
        F.col("user_id"), F.col("tier").alias("early_tier")
    )
    late = tiers_for(1).select(
        F.col("user_id"), F.col("tier").alias("late_tier")
    )
    return (
        early.join(late, "user_id", "full_outer")
        .groupBy(
            F.coalesce("early_tier", F.lit(0)).cast("long").alias("early_tier"),
            F.coalesce("late_tier", F.lit(0)).cast("long").alias("late_tier"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "lineitem_abc_analysis",
    """
    WITH per AS (
      SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(27,4))) AS rev
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT SUM(rev) AS trev FROM per),
    c AS (
      SELECT l_partkey, rev,
             CAST(ROW_NUMBER() OVER (ORDER BY rev DESC, l_partkey) AS BIGINT) AS rn,
             SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS crev
      FROM per
    ),
    cls AS (
      SELECT c.*, t.trev,
             CASE WHEN c.crev * 5 <= t.trev * 4 THEN 'A'
                  WHEN c.crev * 20 <= t.trev * 19 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM c, tot t
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(MIN(rn) AS BIGINT) AS min_rank,
           CAST(MAX(rn) AS BIGINT) AS max_rank,
           CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE) AS class_revenue,
           CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(MAX(trev) AS VARCHAR) AS DOUBLE) AS revenue_share
    FROM cls GROUP BY abc_class
    """,
)
def lineitem_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by exact decimal
    revenue, class A = the head carrying ≤80% of cumulative revenue,
    B to 95%, C the tail — the Pareto entry's actionable sibling
    (inventory policy assigns count frequency per class). The class
    boundaries are EXACT-DECIMAL comparisons (crev·5 ≤ trev·4,
    crev·20 ≤ trev·19 — no float share ever decides a class), so the
    classification is engine-exact by construction; doubles appear
    only in the reported per-class revenue/share via the digit-string
    conversion. Cumulative revenue from the TWO-PASS distributed
    cumsum (no single-reducer window over |parts|)."""
    from .ranking import with_global_cumsum

    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(27,4)")).alias("rev")
    )
    c = with_global_cumsum(
        per,
        key_order=[("rev", "desc")],
        tie_order=[("l_partkey", "asc")],
        sum_col="rev",
    )
    five = F.lit(5).cast("decimal(2,0)")
    four = F.lit(4).cast("decimal(2,0)")
    twenty = F.lit(20).cast("decimal(2,0)")
    nineteen = F.lit(19).cast("decimal(2,0)")
    abc = (
        F.when(F.col("cum_sum") * five <= F.col("total_sum") * four, "A")
        .when(F.col("cum_sum") * twenty <= F.col("total_sum") * nineteen, "B")
        .otherwise("C")
    )
    grouped = c.groupBy(abc.alias("abc_class")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("rn").cast("long").alias("min_rank"),
        F.max("rn").cast("long").alias("max_rank"),
        F.sum("rev").alias("class_rev_dec"),
        F.max("total_sum").alias("trev_dec"),
    )
    return grouped.select(
        "abc_class",
        "n_parts",
        "min_rank",
        "max_rank",
        F.col("class_rev_dec").cast("string").cast("double").alias("class_revenue"),
        (
            F.col("class_rev_dec").cast("string").cast("double")
            / F.col("trev_dec").cast("string").cast("double")
        ).alias("revenue_share"),
    )


PATH_PREFIX_LEN = 5  # journey prefix length (first K events per user)
PATH_TOP_N = 20  # emitted paths, by population


@register(
    "events_top_paths",
    f"""
    WITH r AS (
      SELECT user_id, event_type, {_TS} AS tss, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY {_TS}, event_id) AS rn
      FROM events WHERE user_id IS NOT NULL
    ),
    journeys AS (
      SELECT user_id,
             string_agg(CASE WHEN rn <= {PATH_PREFIX_LEN}
                             THEN event_type END, '>'
                        ORDER BY tss, event_id) AS path,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
      FROM r GROUP BY user_id
    )
    SELECT path,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(conv) AS BIGINT) AS n_converted,
           CAST(SUM(conv) AS DOUBLE) / COUNT(*) AS conv_rate
    FROM journeys
    GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT {PATH_TOP_N}
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey prefixes: each user's first {K} events (by ts,
    event_id — the same µs-truncated order on both engines) joined
    into a '>'-delimited path string, rolled up to the {N} most
    common paths with their populations and eventual-purchase
    conversion rate — the full-path sibling of the pairwise
    transition matrices (event_transition_matrix,
    event_second_order_transitions).

    Plan: ONE user_id exchange serves both the prefix window and the
    per-user aggregation (the sessionization discipline); the path
    rollup is a hash-agg on the path string; top-N is
    TakeOrderedAndProject (no global sort). Strings + integer counts
    + one final IEEE division — no float hazard. The prefix filter
    rides collect_list's null-skipping (same trick as the pagerank
    adjacency build), so one pass computes the prefix path AND the
    whole-history conversion flag."""
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select("user_id", "ts", "event_id", "event_type")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = e.withColumn("rn", F.row_number().over(w))
    journeys = r.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("rn") <= PATH_PREFIX_LEN,
                            F.struct("ts", "event_id", "event_type"),
                        )
                    )
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    agg = journeys.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("conv").cast("long").alias("n_converted"),
    )
    return (
        agg.select(
            "path",
            "n_users",
            "n_converted",
            (
                F.col("n_converted").cast("double")
                / F.col("n_users").cast("double")
            ).alias("conv_rate"),
        )
        .orderBy(F.desc("n_users"), F.asc("path"))
        .limit(PATH_TOP_N)
    )


# Shapley is exponential in the channel vocabulary BY DEFINITION
# (2^n coalitions); above this the sampled-permutation estimator is
# the documented alternative. 12 also bounds the exact integer
# numerator: max |phi_num| <= 12! * conversions — overflow-safe below
# ~1.9e10 conversions, beyond any real corpus.
SHAPLEY_MAX_CHANNELS = 12

_FACTS = [1, 1, 2, 6, 24, 120, 720, 5040, 40320, 362880, 3628800, 39916800, 479001600]


@register(
    "events_shapley_attribution",
    """
    WITH RECURSIVE chans AS (
      SELECT event_type AS channel,
             CAST(ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS BIGINT)
               AS bit
      FROM (SELECT DISTINCT event_type FROM events
            WHERE user_id IS NOT NULL AND event_type != 'purchase') t
    ),
    nch AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM chans),
    user_masks AS (
      SELECT e.user_id,
             CAST(COALESCE(SUM(DISTINCT (1::BIGINT << c.bit)), 0)
                  AS BIGINT) AS mask,
             MAX(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
      FROM events e LEFT JOIN chans c ON c.channel = e.event_type
      WHERE e.user_id IS NOT NULL
      GROUP BY e.user_id
    ),
    convs AS (
      SELECT mask, CAST(SUM(conv) AS BIGINT) AS n_conv
      FROM user_masks GROUP BY mask
    ),
    spine(cmask) AS (
      SELECT CAST(0 AS BIGINT)
      UNION ALL
      SELECT cmask + 1 FROM spine
      WHERE cmask + 1 < (SELECT (1::BIGINT << n) FROM nch)
    ),
    v AS (
      SELECT s.cmask, COALESCE(SUM(c.n_conv), 0) AS val
      FROM spine s LEFT JOIN convs c ON (c.mask & s.cmask) = c.mask
      GROUP BY s.cmask
    ),
    fact(k, f) AS (
      VALUES (0,1),(1,1),(2,2),(3,6),(4,24),(5,120),(6,720),(7,5040),
             (8,40320),(9,362880),(10,3628800),(11,39916800),
             (12,479001600)
    ),
    marginals AS (
      SELECT ch.channel, bit_count(s.cmask) AS ssize,
             vs.val AS v_s, vsc.val AS v_sc
      FROM chans ch
      JOIN spine s ON (s.cmask & (1::BIGINT << ch.bit)) = 0
      JOIN v vs ON vs.cmask = s.cmask
      JOIN v vsc ON vsc.cmask = (s.cmask | (1::BIGINT << ch.bit))
    )
    SELECT m.channel,
           CAST(SUM(fs.f * fns.f * (m.v_sc - m.v_s)) AS BIGINT)
             AS shapley_num,
           (SELECT n FROM nch) AS n_channels,
           CAST(SUM(fs.f * fns.f * (m.v_sc - m.v_s)) AS DOUBLE)
             / (SELECT f FROM fact WHERE k = (SELECT n FROM nch))
             AS shapley
    FROM marginals m
    JOIN fact fs ON fs.k = m.ssize
    JOIN fact fns ON fns.k = (SELECT n FROM nch) - 1 - m.ssize
    GROUP BY m.channel
    """,
)
def events_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value multi-touch attribution — the third member of the
    attribution triple (position rules: attribution_position_credit;
    chain removal: events_markov_attribution): each channel's credit
    is its average marginal contribution over every coalition of the
    other channels, with coalition worth v(S) = conversions by users
    whose touched-channel set fits inside S (monotone; the zero-touch
    coalition rides mask 0 and cancels in every marginal).

    EXACT arithmetic end-to-end: the Shapley weight |S|!·(n−1−|S|)!/n!
    keeps its integer numerator — φ_num = Σ |S|!(n−1−|S|)!·Δv is a
    BIGINT on both engines — and the single final division by n! is
    one IEEE op, so the entry is fully hash-oracle-able (the DuckDB
    twin re-derives the channel bits, the 2^n coalition spine — a
    recursive counter, generate_series rejects subquery bounds — and
    the same integer sums). Efficiency (Σφ = conversions of
    channel-touching users) is pytest-pinned.

    Plan: one events pass builds per-user masks (channel dim
    broadcast); everything after is coalition-sized — 2^n·n rows for
    n ≤ 12 channels (vocabulary-bounded, the markov channel-gate
    class), never corpus-sized."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    channels = sorted(
        r.event_type
        for r in e.select("event_type").distinct().collect()
        if r.event_type != "purchase"
    )  # channel-vocabulary-bounded metadata fetch (the markov pattern)
    n = len(channels)
    if n > SHAPLEY_MAX_CHANNELS:
        raise ValueError(
            f"exact Shapley is 2^n in the channel vocabulary: n={n} > "
            f"{SHAPLEY_MAX_CHANNELS}; use a sampled-permutation estimator"
        )
    chans = spark.createDataFrame(
        [(c, b) for b, c in enumerate(channels)], "channel string, bit long"
    )
    user_masks = (
        e.join(F.broadcast(chans), e.event_type == chans.channel, "left")
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum_distinct(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")),
                F.lit(0).cast("long"),
            ).alias("mask"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv"),
        )
    )
    convs = user_masks.groupBy("mask").agg(
        F.sum("conv").cast("long").alias("n_conv")
    )
    spine = spark.range(1 << n).select(F.col("id").alias("cmask"))
    v = (
        spine.join(
            convs,
            (F.col("mask").bitwiseAND(F.col("cmask"))) == F.col("mask"),
            "left",
        )
        .groupBy("cmask")
        .agg(F.coalesce(F.sum("n_conv"), F.lit(0).cast("long")).alias("val"))
        .persist()  # two consumers below: v(S) and v(S ∪ {c})
    )
    marg = (
        chans.crossJoin(v.select(F.col("cmask").alias("smask"), F.col("val").alias("v_s")))
        .where(
            F.col("smask").bitwiseAND(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")
            )
            == 0
        )
        .withColumn(
            "scmask",
            F.col("smask").bitwiseOR(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")
            ),
        )
        .join(
            v.select(F.col("cmask").alias("scmask"), F.col("val").alias("v_sc")),
            "scmask",
        )
        .withColumn("ssize", F.bit_count("smask").cast("int"))
    )
    w_s = F.element_at(F.lit(_FACTS), F.col("ssize") + 1).cast("long")
    w_ns = F.element_at(F.lit(_FACTS), F.lit(n) - F.col("ssize")).cast("long")
    return (
        marg.groupBy("channel")
        .agg(
            F.sum(w_s * w_ns * (F.col("v_sc") - F.col("v_s")))
            .cast("long")
            .alias("shapley_num")
        )
        .select(
            "channel",
            "shapley_num",
            F.lit(n).cast("long").alias("n_channels"),
            (
                F.col("shapley_num").cast("double")
                / F.lit(float(_FACTS[n]))
            ).alias("shapley"),
        )
    )


@register(
    "ml_eval_next_event_hitrate",
    f"""
    WITH m AS (
      SELECT (CAST(epoch_us(min({_TS})) AS BIGINT)
              + CAST(epoch_us(max({_TS})) AS BIGINT)) // 2 AS mid_us
      FROM events WHERE user_id IS NOT NULL
    ),
    seq AS (
      SELECT user_id, event_type, event_id,
             CAST(epoch_us({_TS}) AS BIGINT) AS ts_us,
             CASE WHEN CAST(epoch_us({_TS}) AS BIGINT) <= m.mid_us
                  THEN 0 ELSE 1 END AS half
      FROM events, m WHERE user_id IS NOT NULL
    ),
    pairs AS (
      SELECT half, event_type AS src,
             LEAD(event_type) OVER (PARTITION BY user_id, half
                                    ORDER BY ts_us, event_id) AS dst
      FROM seq
    ),
    train AS (
      SELECT src, dst, COUNT(*) AS cnt
      FROM pairs WHERE half = 0 AND dst IS NOT NULL
      GROUP BY src, dst
    ),
    pred AS (
      SELECT src, dst AS predicted FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY cnt DESC, dst) AS rn
        FROM train
      ) WHERE rn = 1
    ),
    test AS (
      SELECT src, dst FROM pairs WHERE half = 1 AND dst IS NOT NULL
    )
    SELECT t.src, p.predicted,
           CAST(COUNT(*) AS BIGINT) AS n_test_transitions,
           CAST(SUM(CASE WHEN t.dst = p.predicted THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           CAST(SUM(CASE WHEN t.dst = p.predicted THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS hit_rate
    FROM test t LEFT JOIN pred p USING (src)
    GROUP BY t.src, p.predicted
    """,
)
def ml_eval_next_event_hitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal backtest of the first-order next-event model — the
    sequence-model member of the eval family: the transition argmax
    trains on the first half of the time horizon (per-source most
    frequent successor, lexicographic tie-break) and is scored hit@1
    on the second half's transitions, per source type. An honest
    train/test protocol (no peeking across the midpoint; sessions
    never straddle it because pairing is confined within each half)
    with all-integer counts and one final division.

    Scale: the pair extraction is one (user, half)-partitioned lag
    window; the transition matrix and argmax ride vocabulary²-bounded
    frames; the midpoint is a 1-row broadcast scalar (the DiD
    pattern)."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    bounds = e.agg(
        F.expr(
            "CAST((CAST(min(unix_micros(ts)) AS BIGINT)"
            " + CAST(max(unix_micros(ts)) AS BIGINT)) div 2 AS BIGINT)"
        ).alias("mid_us")
    )
    seq = e.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.when(F.unix_micros("ts") <= F.col("mid_us"), 0)
        .otherwise(1)
        .alias("half"),
    )
    w = Window.partitionBy("user_id", "half").orderBy("ts_us", "event_id")
    pairs = seq.select(
        "half",
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    train = (
        pairs.where((F.col("half") == 0) & F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wp = Window.partitionBy("src").orderBy(F.col("cnt").desc(), F.col("dst"))
    pred = (
        train.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") == 1)
        .select("src", F.col("dst").alias("predicted"))
    )
    test = pairs.where((F.col("half") == 1) & F.col("dst").isNotNull())
    return (
        test.join(pred, "src", "left")
        .groupBy("src", "predicted")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test_transitions"),
            F.count_if(F.col("dst") == F.col("predicted"))
            .cast("long")
            .alias("n_hits"),
        )
        .withColumn(
            "hit_rate",
            F.col("n_hits").cast("double")
            / F.col("n_test_transitions").cast("double"),
        )
    )
