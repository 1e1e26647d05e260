"""Temporal operators: as-of join, range join, tumbling/sliding
windows (batch twins of the streaming layer's windowed aggregations).

Spark has no native AS-OF join; the scalable composition is the
union+window trick (tag both streams, union, one window over
(key, time) carrying forward the last right-side row) — a single
shuffle on the key, no cross/theta join, no per-group pandas. The
DuckDB oracle uses its native ASOF JOIN, which pins the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

_TS = "CAST(ts AS TIMESTAMP)"


@register(
    "asof_join_last_click",
    f"""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           epoch_us({_TS.replace('ts', 'p.ts')}) AS purchase_ts_us,
           c.event_id AS click_id,
           epoch_us({_TS.replace('ts', 'c.ts')}) AS click_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
    """,
)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each purchase matched to the user's most recent
    click at-or-before it (LEFT: purchases with no prior click keep
    NULLs).

    Implementation: tag clicks and purchases, union, window over
    (user_id ORDER BY ts, is_click DESC) carrying the last click via
    ``last(..., ignorenulls)``. ``is_click DESC`` orders a click before
    a same-instant purchase, matching ASOF's ``>=``. One shuffle on
    user_id regardless of either side's size — this is the plan that
    survives 100 TB, unlike a per-user pandas merge_asof.
    """
    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("purchase_id"),
        F.col("event_id").alias("click_id"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_id"),
        F.lit(None).cast("long").alias("click_id"),
    )
    unioned = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("click_id").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("last_click_id", F.last("click_id", ignorenulls=True).over(w))
        .withColumn(
            "last_click_ts",
            F.last(F.when(F.col("click_id").isNotNull(), F.col("ts")), ignorenulls=True).over(w),
        )
        .where(F.col("purchase_id").isNotNull())
        .select(
            "purchase_id",
            "user_id",
            F.unix_micros("ts").alias("purchase_ts_us"),
            F.col("last_click_id").alias("click_id"),
            F.unix_micros("last_click_ts").alias("click_ts_us"),
        )
    )


@register(
    "range_join_recent_lineitems",
    """
    SELECT o.o_orderkey,
           count(l.l_orderkey) AS n_shipped_30d
    FROM orders o
    LEFT JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
    GROUP BY o.o_orderkey
    """,
)
def range_join_recent_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi+range join: lineitems shipped within 30 days of their
    order. The equi key (orderkey) drives the shuffle; the range
    predicate evaluates post-match — no theta-join blowup."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    )
    return (
        o.join(li, cond, "left")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("n_shipped_30d"))
    )


@register(
    "tumbling_window_hourly",
    f"""
    SELECT date_trunc('hour', {_TS}) AS window_start,
           event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_window_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window (1h) — the batch twin of Structured
    Streaming's ``window(ts, '1 hour')`` aggregation (the streaming
    module runs the same plan over readStream)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour").start.alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(27,4)")).cast("double").alias("sum_value"),
        )
    )


@register(
    "sliding_window_counts",
    f"""
    WITH slid AS (
      SELECT e.*, date_trunc('hour', {_TS}) + (s.i - 1) * INTERVAL 30 MINUTE
               - CASE WHEN {_TS} >= date_trunc('hour', {_TS}) + INTERVAL 30 MINUTE
                      THEN INTERVAL 0 MINUTE ELSE INTERVAL 30 MINUTE END AS window_start
      FROM events e, generate_series(1, 2) s(i)
    )
    SELECT window_start, count(*) AS n_events
    FROM slid
    WHERE {_TS} >= window_start AND {_TS} < window_start + INTERVAL 1 HOUR
    GROUP BY window_start
    """,
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h length, 30min slide): each event lands in 2
    overlapping windows. Spark's ``window()`` generates the copies
    JVM-side; the oracle reproduces them with generate_series."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").start.alias("window_start"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "timeseries_resample_ffill",
    f"""
    WITH e AS (
      SELECT user_id, {_TS} AS t, value FROM events WHERE user_id < 20
    ),
    hourly AS (
      SELECT user_id, date_trunc('hour', t) AS hour,
             CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS sum_value,
             count(*) AS n_events
      FROM e GROUP BY 1, 2
    ),
    bounds AS (
      SELECT date_trunc('hour', min(t)) AS h0, date_trunc('hour', max(t)) AS h1
      FROM e
    ),
    users AS (SELECT DISTINCT user_id FROM e),
    grid AS (
      SELECT u.user_id,
             unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS hour
      FROM users u, bounds b
    )
    SELECT g.user_id, g.hour,
           coalesce(h.n_events, 0) AS n_events,
           last_value(h.sum_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM grid g LEFT JOIN hourly h
      ON h.user_id = g.user_id AND h.hour = g.hour
    """,
)
def timeseries_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling to an hourly grid with forward fill —
    the gap-filling operator (hypertable `time_bucket_gapfill` /
    `locf` semantics) as pure DataFrame ops: hourly agg → hour grid
    (sequence × users) → left join → `last(ignorenulls)` running
    window. The grid explode is map-side; the only shuffles are the
    hourly agg and the per-user fill window (user-bounded state)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").where(F.col("user_id") < 20)
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.sum(F.col("value").cast("decimal(27,4)")).cast("double").alias("sum_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    users = e.select("user_id").distinct()
    grid = users.crossJoin(bounds).select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("sum_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


@register(
    "asof_join_nearest_click",
    f"""
    WITH tagged AS (
      SELECT user_id, {_TS} AS t,
             CASE WHEN event_type = 'click' THEN event_id END AS click_id,
             CASE WHEN event_type = 'purchase' THEN event_id END AS purchase_id
      FROM events WHERE event_type IN ('click', 'purchase')
    ), win AS (
      SELECT *,
             last_value(click_id IGNORE NULLS) OVER w_b AS bwd_id,
             last_value(CASE WHEN click_id IS NOT NULL THEN t END IGNORE NULLS)
               OVER w_b AS bwd_t,
             first_value(click_id IGNORE NULLS) OVER w_f AS fwd_id,
             first_value(CASE WHEN click_id IS NOT NULL THEN t END IGNORE NULLS)
               OVER w_f AS fwd_t
      FROM tagged
      WINDOW
        -- coalesce(purchase_id, click_id) is non-null for every row, so
        -- the order is TOTAL with no engine-specific NULL placement
        -- (two same-instant clicks would otherwise tie)
        w_b AS (PARTITION BY user_id
                ORDER BY t, CASE WHEN click_id IS NULL THEN 1 ELSE 0 END,
                         coalesce(purchase_id, click_id)
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_f AS (PARTITION BY user_id
                ORDER BY t, CASE WHEN click_id IS NULL THEN 1 ELSE 0 END,
                         coalesce(purchase_id, click_id)
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT purchase_id, user_id, epoch_us(t) AS purchase_ts_us,
           CASE WHEN fwd_id IS NULL
                  OR (bwd_id IS NOT NULL
                      AND epoch_us(t) - epoch_us(bwd_t)
                          <= epoch_us(fwd_t) - epoch_us(t))
                THEN bwd_id ELSE fwd_id END AS click_id,
           CASE WHEN fwd_id IS NULL
                  OR (bwd_id IS NOT NULL
                      AND epoch_us(t) - epoch_us(bwd_t)
                          <= epoch_us(fwd_t) - epoch_us(t))
                THEN epoch_us(bwd_t) ELSE epoch_us(fwd_t) END AS click_ts_us
    FROM win WHERE purchase_id IS NOT NULL
    """,
)
def asof_join_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor as-of: each purchase matched to the CLOSEST
    click in either time direction (ties → backward). Same union +
    single-exchange window shape as the backward as-of, with a second
    (forward) frame over the identical sort — Catalyst reuses the one
    user_id exchange for both frames. The plan that replaces
    pandas merge_asof(direction='nearest') at scale."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    tagged = e.select(
        "user_id",
        "ts",
        F.when(F.col("event_type") == "click", F.col("event_id")).alias("click_id"),
        F.when(F.col("event_type") == "purchase", F.col("event_id")).alias("purchase_id"),
    )
    order = [
        F.col("ts").asc(),
        F.when(F.col("click_id").isNull(), 1).otherwise(0).asc(),
        # non-null for every row -> total order, no NULL-placement
        # divergence between engines on same-instant duplicate clicks
        F.coalesce("purchase_id", "click_id").asc(),
    ]
    w_b = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    click_t = F.when(F.col("click_id").isNotNull(), F.col("ts"))
    win = tagged.select(
        "*",
        F.last("click_id", ignorenulls=True).over(w_b).alias("bwd_id"),
        F.last(click_t, ignorenulls=True).over(w_b).alias("bwd_t"),
        F.first("click_id", ignorenulls=True).over(w_f).alias("fwd_id"),
        F.first(click_t, ignorenulls=True).over(w_f).alias("fwd_t"),
    ).where(F.col("purchase_id").isNotNull())
    t_us = F.unix_micros("ts")
    use_bwd = F.col("fwd_id").isNull() | (
        F.col("bwd_id").isNotNull()
        & ((t_us - F.unix_micros("bwd_t")) <= (F.unix_micros("fwd_t") - t_us))
    )
    return win.select(
        "purchase_id",
        "user_id",
        t_us.alias("purchase_ts_us"),
        F.when(use_bwd, F.col("bwd_id")).otherwise(F.col("fwd_id")).alias("click_id"),
        F.when(use_bwd, F.unix_micros("bwd_t"))
        .otherwise(F.unix_micros("fwd_t"))
        .alias("click_ts_us"),
    )


@register(
    "sliding_window_distinct_users",
    f"""
    WITH slid AS (
      SELECT e.*, date_trunc('hour', {_TS}) + (s.i - 1) * INTERVAL 30 MINUTE
               - CASE WHEN {_TS} >= date_trunc('hour', {_TS}) + INTERVAL 30 MINUTE
                      THEN INTERVAL 0 MINUTE ELSE INTERVAL 30 MINUTE END AS window_start
      FROM events e, generate_series(1, 2) s(i)
    )
    SELECT window_start, count(DISTINCT user_id) AS n_users
    FROM slid
    WHERE {_TS} >= window_start AND {_TS} < window_start + INTERVAL 1 HOUR
    GROUP BY window_start
    """,
)
def sliding_window_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct users (1h window, 30min slide) — the
    concurrent-actives metric. countDistinct plans as a two-level
    partial aggregation over (window, user_id); at extreme
    cardinality swap in approx_count_distinct (the approx_aggregates
    entry documents the sketch tier)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.window("ts", "1 hour", "30 minutes").start.alias("window_start")
    ).agg(F.countDistinct("user_id").alias("n_users"))


@register(
    "asof_join_next_purchase",
    f"""
    SELECT c.event_id AS click_id,
           c.user_id,
           epoch_us(CAST(c.ts AS TIMESTAMP)) AS click_ts_us,
           p.event_id AS purchase_id,
           p.purchase_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN LATERAL (
      SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS purchase_ts_us
      FROM events p
      WHERE p.event_type = 'purchase'
        AND p.user_id = c.user_id
        AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
        AND CAST(p.ts AS TIMESTAMP)
              <= CAST(c.ts AS TIMESTAMP) + INTERVAL 7 DAY
      ORDER BY CAST(p.ts AS TIMESTAMP), event_id
      LIMIT 1
    ) p ON TRUE
    """,
)
def asof_join_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance — the attribution shape: each
    click matched to the user's NEXT purchase at-or-after it, but only
    within a 7-day window (merge_asof direction='forward' +
    tolerance, the two knobs the backward operator lacks).

    Same single-shuffle union+window composition as the backward
    variant, mirrored: the frame looks FORWARD
    (currentRow → unboundedFollowing) and ``first(..., ignorenulls)``
    grabs the earliest purchase; at equal instants clicks sort before
    purchases (null ids first) so a same-timestamp purchase is
    inside its click's frame, and among same-instant purchases the
    smallest event_id wins — matching the oracle's LATERAL
    ``ORDER BY ts, event_id LIMIT 1`` exactly. The tolerance is a
    map-side null-out AFTER the match (a match past 7 days means no
    earlier one existed, so nulling it is precisely merge_asof's
    semantics). The oracle is an independent formulation (correlated
    LATERAL top-1), not a transliteration of the window trick.
    """
    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
    )
    unioned = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("purchase_id").asc_nulls_first())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    matched = (
        unioned.withColumn(
            "next_purchase_id", F.first("purchase_id", ignorenulls=True).over(w)
        )
        .withColumn(
            "next_purchase_ts",
            F.first(
                F.when(F.col("purchase_id").isNotNull(), F.col("ts")),
                ignorenulls=True,
            ).over(w),
        )
        .where(F.col("click_id").isNotNull())
    )
    in_window = F.col("next_purchase_ts") <= F.col("ts") + F.expr("INTERVAL 7 DAYS")
    return matched.select(
        "click_id",
        "user_id",
        F.unix_micros("ts").alias("click_ts_us"),
        F.when(in_window, F.col("next_purchase_id")).alias("purchase_id"),
        F.when(in_window, F.unix_micros("next_purchase_ts")).alias("purchase_ts_us"),
    )


@register(
    "interval_overlap_sessions",
    f"""
    WITH seq AS (
      SELECT user_id, {_TS} AS tsx,
             LAG({_TS}) OVER (PARTITION BY user_id ORDER BY {_TS}, event_id)
               AS prev
      FROM events WHERE user_id IS NOT NULL
    ),
    isl AS (
      SELECT user_id, tsx,
             SUM(CASE WHEN prev IS NULL
                       OR epoch_us(tsx) - epoch_us(prev) > 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY tsx
                     ROWS UNBOUNDED PRECEDING) AS sid
      FROM seq
    ),
    sessions AS (
      SELECT user_id, sid,
             epoch_us(min(tsx)) AS s_us, epoch_us(max(tsx)) AS e_us
      FROM isl GROUP BY user_id, sid
    )
    SELECT a.user_id AS user_a, a.s_us AS start_a_us,
           b.user_id AS user_b, b.s_us AS start_b_us,
           least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us) AS overlap_us
    FROM sessions a JOIN sessions b
      ON a.user_id < b.user_id AND a.s_us <= b.e_us AND b.s_us <= a.e_us
    """,
)
def interval_overlap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join (concurrency analysis): which pairs
    of user sessions were active at the same moment. A naive theta
    join is |sessions|² — Spark would execute it as BNLJ; instead
    each interval explodes into the HOUR BUCKETS it covers (bounded
    fan-out: sessions are gap-bounded) and candidates equi-join on
    the bucket, so the only shuffle is hash-partitioned by hour and
    cost is Σ per-bucket concurrent-pairs — the true output size, not
    |sessions|². A pair spanning several shared hours is deduped with
    a distinct on the pair key. The DuckDB oracle runs the direct
    quadratic theta join (its IEJoin handles sf0.01), so the hash
    match proves the bucket decomposition finds EXACTLY the
    ground-truth overlap set. Hot hours (everyone online at once) are
    the documented skew axis: shrink the bucket to minutes or salt
    the bucket key — the decomposition is unchanged."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull() | ((F.unix_micros("ts") - F.unix_micros(prev)) > 1800000000),
        1,
    ).otherwise(0)
    wrun = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sessions = (
        e.withColumn("sid", F.sum(new_sess).over(wrun))
        .groupBy("user_id", "sid")
        .agg(
            F.unix_micros(F.min("ts")).alias("s_us"),
            F.unix_micros(F.max("ts")).alias("e_us"),
        )
    )
    hour_us = 3600 * 1_000_000
    buckets = sessions.withColumn(
        "bucket",
        F.explode(F.expr(f"sequence(s_us div {hour_us}, e_us div {hour_us})")),
    )
    a = buckets.select(
        F.col("user_id").alias("user_a"),
        F.col("s_us").alias("start_a_us"),
        F.col("e_us").alias("end_a_us"),
        "bucket",
    )
    b = buckets.select(
        F.col("user_id").alias("user_b"),
        F.col("s_us").alias("start_b_us"),
        F.col("e_us").alias("end_b_us"),
        "bucket",
    )
    return (
        a.join(b, "bucket")
        .where(
            (F.col("user_a") < F.col("user_b"))
            & (F.col("start_a_us") <= F.col("end_b_us"))
            & (F.col("start_b_us") <= F.col("end_a_us"))
        )
        .select(
            "user_a",
            "start_a_us",
            "user_b",
            "start_b_us",
            (
                F.least("end_a_us", "end_b_us")
                - F.greatest("start_a_us", "start_b_us")
            ).alias("overlap_us"),
        )
        .distinct()
    )


@register(
    "timeseries_interpolate_linear",
    f"""
    WITH e AS (
      SELECT user_id, {_TS} AS t, value FROM events WHERE user_id < 20
    ),
    hourly AS (
      SELECT user_id, date_trunc('hour', t) AS hour,
             CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS sum_value,
             count(*) AS n_events
      FROM e GROUP BY 1, 2
    ),
    bounds AS (
      SELECT date_trunc('hour', min(t)) AS h0, date_trunc('hour', max(t)) AS h1
      FROM e
    ),
    users AS (SELECT DISTINCT user_id FROM e),
    grid AS (
      SELECT u.user_id,
             unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS hour
      FROM users u, bounds b
    ),
    joined AS (
      SELECT g.user_id, g.hour, h.sum_value,
             coalesce(h.n_events, 0) AS n_events
      FROM grid g LEFT JOIN hourly h
        ON h.user_id = g.user_id AND h.hour = g.hour
    ),
    win AS (
      SELECT *,
             last_value(sum_value IGNORE NULLS) OVER w_b AS pv,
             last_value(CASE WHEN sum_value IS NOT NULL THEN hour END
                        IGNORE NULLS) OVER w_b AS pt,
             first_value(sum_value IGNORE NULLS) OVER w_f AS nv,
             first_value(CASE WHEN sum_value IS NOT NULL THEN hour END
                         IGNORE NULLS) OVER w_f AS nt
      FROM joined
      WINDOW
        w_b AS (PARTITION BY user_id ORDER BY hour
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_f AS (PARTITION BY user_id ORDER BY hour
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, hour, n_events,
           CASE WHEN sum_value IS NOT NULL THEN sum_value
                WHEN pv IS NULL OR nv IS NULL THEN NULL
                ELSE pv + (nv - pv)
                       * (CAST(datediff('hour', pt, hour) AS DOUBLE)
                          / CAST(datediff('hour', pt, nt) AS DOUBLE))
           END AS interp_value
    FROM win
    """,
)
def timeseries_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling with LINEAR interpolation (hypertable
    `time_bucket_gapfill` + `interpolate` semantics) — the sibling of
    timeseries_resample_ffill: hourly agg → hour grid → left join →
    bracketing known points via running last/first(ignorenulls)
    windows → v = pv + (nv − pv) · Δt/ΔT. Leading/trailing gaps stay
    NULL (no extrapolation). The hour offsets are exact integers on
    both engines, so the interpolation chain is one deterministic
    IEEE sequence (division of exact ints, one multiply, one add) and
    hash-matches. Per-user windows: user-bounded state, grid explode
    map-side — same scale shape as the ffill entry."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").where(F.col("user_id") < 20)
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.sum(F.col("value").cast("decimal(27,4)")).cast("double").alias("sum_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    users = e.select("user_id").distinct()
    grid = users.crossJoin(bounds).select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    joined = grid.join(hourly, ["user_id", "hour"], "left").select(
        "user_id",
        "hour",
        "sum_value",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )
    w_b = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_hour = F.when(F.col("sum_value").isNotNull(), F.col("hour"))
    win = joined.select(
        "user_id",
        "hour",
        "sum_value",
        "n_events",
        F.last("sum_value", ignorenulls=True).over(w_b).alias("pv"),
        F.last(known_hour, ignorenulls=True).over(w_b).alias("pt"),
        F.first("sum_value", ignorenulls=True).over(w_f).alias("nv"),
        F.first(known_hour, ignorenulls=True).over(w_f).alias("nt"),
    )
    interp = (
        F.when(F.col("sum_value").isNotNull(), F.col("sum_value"))
        .when(F.col("pv").isNull() | F.col("nv").isNull(), F.lit(None))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (
                F.expr("timestampdiff(HOUR, pt, hour)").cast("double")
                / F.expr("timestampdiff(HOUR, pt, nt)").cast("double")
            )
        )
    )
    return win.select(
        "user_id", "hour", "n_events", interp.alias("interp_value")
    )


# Allen relation of interval A w.r.t. B, evaluated top-down (equality
# cases first so boundary ties classify identically on both engines);
# the pair join guarantees touch-or-overlap, so before/after are
# excluded by construction
_ALLEN_CASE = """CASE
  WHEN sa = sb AND ea = eb THEN 'equals'
  WHEN sa = sb AND ea < eb THEN 'starts'
  WHEN sa = sb AND ea > eb THEN 'started_by'
  WHEN ea = eb AND sa > sb THEN 'finishes'
  WHEN ea = eb AND sa < sb THEN 'finished_by'
  WHEN sa > sb AND ea < eb THEN 'during'
  WHEN sa < sb AND ea > eb THEN 'contains'
  WHEN ea = sb THEN 'meets'
  WHEN eb = sa THEN 'met_by'
  WHEN sa < sb THEN 'overlaps'
  ELSE 'overlapped_by' END"""


@register(
    "interval_allen_relations",
    f"""
    WITH seq AS (
      SELECT user_id, {_TS} AS tsx,
             LAG({_TS}) OVER (PARTITION BY user_id ORDER BY {_TS}, event_id)
               AS prev
      FROM events WHERE user_id IS NOT NULL
    ),
    isl AS (
      SELECT user_id, tsx,
             SUM(CASE WHEN prev IS NULL
                       OR epoch_us(tsx) - epoch_us(prev) > 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY tsx
                     ROWS UNBOUNDED PRECEDING) AS sid
      FROM seq
    ),
    sessions AS (
      SELECT user_id, sid,
             epoch_us(min(tsx)) AS s_us, epoch_us(max(tsx)) AS e_us
      FROM isl GROUP BY user_id, sid
    ),
    pairs AS (
      SELECT a.user_id AS user_a, a.s_us AS start_a_us,
             b.user_id AS user_b, b.s_us AS start_b_us,
             a.s_us AS sa, a.e_us AS ea, b.s_us AS sb, b.e_us AS eb
      FROM sessions a JOIN sessions b
        ON a.user_id < b.user_id AND a.s_us <= b.e_us AND b.s_us <= a.e_us
    )
    SELECT user_a, start_a_us, user_b, start_b_us,
           {_ALLEN_CASE} AS relation
    FROM pairs
    """,
)
def interval_allen_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen's interval-algebra classification of concurrent session
    pairs — the temporal-reasoning layer above interval_overlap:
    every touching-or-overlapping cross-user pair is labeled with its
    Allen relation (equals/starts/finishes/during/contains/meets/
    overlaps + inverses; before/after are excluded by the join
    predicate, keeping the output the true concurrency set, never
    |sessions|²). Pure integer comparisons in a top-down CASE —
    boundary ties classify identically on both engines.

    Scale: identical bucket-decomposition plan as
    interval_overlap_sessions (hour-bucket equi-join, hash-
    partitioned; the documented hot-hour skew note applies)."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull() | ((F.unix_micros("ts") - F.unix_micros(prev)) > 1800000000),
        1,
    ).otherwise(0)
    wrun = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sessions = (
        e.withColumn("sid", F.sum(new_sess).over(wrun))
        .groupBy("user_id", "sid")
        .agg(
            F.unix_micros(F.min("ts")).alias("s_us"),
            F.unix_micros(F.max("ts")).alias("e_us"),
        )
    )
    hour_us = 3600 * 1_000_000
    buckets = sessions.withColumn(
        "bucket",
        F.explode(F.expr(f"sequence(s_us div {hour_us}, e_us div {hour_us})")),
    )
    a = buckets.select(
        F.col("user_id").alias("user_a"),
        F.col("s_us").alias("sa"),
        F.col("e_us").alias("ea"),
        "bucket",
    )
    b = buckets.select(
        F.col("user_id").alias("user_b"),
        F.col("s_us").alias("sb"),
        F.col("e_us").alias("eb"),
        "bucket",
    )
    return (
        a.join(b, "bucket")
        .where(
            (F.col("user_a") < F.col("user_b"))
            & (F.col("sa") <= F.col("eb"))
            & (F.col("sb") <= F.col("ea"))
        )
        .select(
            "user_a",
            F.col("sa").alias("start_a_us"),
            "user_b",
            F.col("sb").alias("start_b_us"),
            F.expr(_ALLEN_CASE).alias("relation"),
        )
        .distinct()
    )
