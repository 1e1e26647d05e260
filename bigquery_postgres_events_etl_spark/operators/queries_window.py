"""Window-function operators (SURVEY §2.5 rebuild layer).

The reference has no window functions; its one dedup-like semantic
(K4) is the row_number()==1 pattern implemented in operators.etl.
This module adds the analytics window surface: ranking, running
aggregates, lag/lead, moving frames, and gap-based sessionization
(the batch twin of streaming session windows).

Scale notes: a window is one shuffle on partitionBy keys + a per-key
sort. Sessionization over (user_id) partitions parallelizes across
users; a single global window (no partitionBy) would serialize and is
avoided everywhere here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import dsum
from ..io import load_table
from ..registry import register

_TS = "CAST(ts AS TIMESTAMP)"
_SESSION_GAP_S = 1800  # 30 min


@register(
    "window_topk_per_group",
    """
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group: row_number over (group, order) — the standard
    replacement for a per-group ORDER BY ... LIMIT."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= 3)
    )


@register(
    "window_rank_functions",
    """
    SELECT s_suppkey, s_acctbal,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           ROW_NUMBER() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS rn
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal DESC)
    """,
)
def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global rank/dense_rank/row_number — two-pass distributed form.

    Supplier is NOT a constant dim (10k×SF rows), so a bare
    ``Window.orderBy`` — which funnels every row through one reducer —
    would be a single-task sort at 100×. ``with_global_ranks``
    range-partitions on the sort key, ranks locally in parallel, and
    adds tiny per-partition prefix offsets; values are identical to
    the single-window oracle (asserted by hash)."""
    from .ranking import with_global_ranks

    s = load_table(spark, sf_dir, "supplier")
    ranked = with_global_ranks(
        s,
        key_order=[("s_acctbal", "desc")],
        tie_order=[("s_suppkey", "asc")],
    )
    return ranked.select("s_suppkey", "s_acctbal", "rnk", "drnk", "rn")


@register(
    "window_running_sum",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_qty
    FROM lineitem
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate per key. The addend goes through the exact
    DECIMAL cast so every prefix sum is order-independent-exact and
    matches the oracle bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    # (orderkey, linenumber) is NOT unique in the synthetic fixture —
    # duplicate rows exist with different measures, so the measure
    # joins the sort key to keep the frame order total
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(27,4)")).over(w).cast("double").alias("running_qty"),
    )


@register(
    "window_moving_avg",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,4))) OVER w AS DOUBLE)
             / COUNT(l_extendedprice) OVER w AS moving_avg_price
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving frame (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice")
        .rowsBetween(-3, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (
            F.sum(F.col("l_extendedprice").cast("decimal(27,4)")).over(w).cast("double")
            / F.count("l_extendedprice").over(w)
        ).alias("moving_avg_price"),
    )


@register(
    "window_lag_lead",
    f"""
    SELECT user_id, event_id,
           epoch_us({_TS}) AS ts_us,
           epoch_us(LAG({_TS}) OVER w) AS prev_ts_us,
           epoch_us(LEAD({_TS}) OVER w) AS next_ts_us,
           epoch_us({_TS}) - epoch_us(LAG({_TS}) OVER w) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY {_TS}, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over the event-time axis per user — the primitive under
    sessionization and as-of semantics."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros("ts")
    return e.select(
        "user_id",
        "event_id",
        ts_us.alias("ts_us"),
        F.unix_micros(F.lag("ts").over(w)).alias("prev_ts_us"),
        F.unix_micros(F.lead("ts").over(w)).alias("next_ts_us"),
        (ts_us - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    )


@register(
    "sessionization",
    f"""
    WITH flagged AS (
      SELECT user_id, event_id, {_TS} AS ts,
             CASE WHEN epoch_us({_TS}) - epoch_us(LAG({_TS}) OVER w)
                       > {_SESSION_GAP_S} * 1000000
                  OR LAG({_TS}) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY {_TS}, event_id)
    ), sessions AS (
      SELECT user_id, event_id, ts,
             -- DuckDB windowed SUM(int) yields HUGEINT; Spark emits BIGINT.
             -- Cast so the driver's type-aware value hash sees LongType on
             -- both sides (root cause of the r1 hash_match=false).
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts)) AS session_end_us
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → new-session
    flag → prefix-sum session ids → per-session agg. Batch twin of
    streaming ``session_window`` (see streaming module). One shuffle
    on user_id; all three window steps share the same partitioning so
    Catalyst reuses the exchange."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(
        gap_us > _SESSION_GAP_S * 1_000_000, 1
    ).when(F.lag("ts").over(w).isNull(), 1).otherwise(0)
    return (
        e.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(cum))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_end_us"),
        )
    )


@register(
    "window_dedup_survivor",
    f"""
    SELECT user_id, ts_us, event_type, event_id FROM (
      SELECT user_id, epoch_us({_TS}) AS ts_us, event_type, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us({_TS}), event_type
                                ORDER BY event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def window_dedup_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 as a pure window op: deterministic first-survivor dedup on
    the reference's UNIQUE(user_id, event_timestamp, event_name) key
    (reference: extract_bq.py:204, 216-221)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", F.unix_micros("ts"), "event_type").orderBy(
        "event_id"
    )
    return (
        e.select(
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_type",
            "event_id",
        )
        .withColumn("rn", F.row_number().over(Window.partitionBy("user_id", "ts_us", "event_type").orderBy("event_id")))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "window_distribution",
    """
    SELECT s_suppkey, s_acctbal,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           ntile(4) OVER (ORDER BY s_acctbal DESC, s_suppkey) AS quartile,
           first_value(s_suppkey) OVER w2 AS richest_key,
           last_value(s_suppkey) OVER w2 AS poorest_key,
           nth_value(s_suppkey, 2) OVER w2 AS second_key
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal DESC),
           w2 AS (ORDER BY s_acctbal DESC, s_suppkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — two-pass distributed form over
    the SF-scaling supplier table (see window_rank_functions).

    percent_rank/cume_dist/ntile derive from the exact integer
    (rank, row_number, cum_cnt, N) with the engines' shared formulas
    — (rnk−1)/(N−1), cum/N, the NTILE bucket-size rule — so the
    doubles are the same divisions the single-window oracle performs.
    first/last/nth over the full frame are global scalars: top-2 via
    TakeOrderedAndProject + min_by/max_by aggregates (all distributed,
    broadcast back as one row)."""
    from .ranking import ntile_from_rn, with_global_ranks

    s = load_table(spark, sf_dir, "supplier")
    ranked = with_global_ranks(
        s,
        key_order=[("s_acctbal", "desc")],
        tie_order=[("s_suppkey", "asc")],
    )
    # full-frame scalars: first/last over (acctbal DESC, suppkey ASC).
    # struct(acctbal, -suppkey) makes max_by pick min-suppkey among
    # acctbal peers (and min_by the max-suppkey) — the window's order.
    ord_struct = F.struct(F.col("s_acctbal"), (-F.col("s_suppkey")).alias("neg"))
    firsts = s.agg(
        F.max_by("s_suppkey", ord_struct).alias("richest_key"),
        F.min_by("s_suppkey", ord_struct).alias("poorest_key"),
    )
    second = (
        s.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
        .limit(2)  # TakeOrderedAndProject — distributed top-k
        .agg(F.min_by("s_suppkey", ord_struct).alias("second_key"))
    )
    n1 = F.col("n_total") - F.lit(1)
    return (
        ranked.crossJoin(F.broadcast(firsts))
        .crossJoin(F.broadcast(second))
        .select(
            "s_suppkey",
            "s_acctbal",
            F.when(n1 > 0, (F.col("rnk") - 1) / n1).otherwise(F.lit(0.0)).alias("pct_rank"),
            (F.col("cum_cnt") / F.col("n_total")).alias("cume"),
            ntile_from_rn(F.col("rn"), F.col("n_total"), 4).alias("quartile"),
            "richest_key",
            "poorest_key",
            "second_key",
        )
    )


@register(
    "mode_per_group",
    """
    SELECT event_type, props_k AS mode_k, cnt AS mode_count FROM (
      SELECT event_type, props_k, cnt,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY cnt DESC, props_k) AS rn
      FROM (
        SELECT event_type, json_extract_string(props, '$.k') AS props_k,
               count(*) AS cnt
        FROM events GROUP BY 1, 2
      )
    ) WHERE rn = 1
    """,
)
def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE per group (most frequent param value,
    smallest-value tie-break) — count + top-1 window; native mode()
    has engine-specific tie behavior, this form doesn't."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy(
        "event_type", F.get_json_object("props", "$.k").alias("props_k")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy(F.desc("cnt"), F.asc("props_k"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_type", F.col("props_k").alias("mode_k"), F.col("cnt").alias("mode_count"))
    )


@register(
    "window_range_frame",
    f"""
    SELECT l_suppkey, l_orderkey, l_linenumber, ship_us,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) OVER (
             PARTITION BY l_suppkey ORDER BY ship_us
             RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS qty_30d
    FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
                 epoch_us(CAST(l_shipdate AS TIMESTAMP)) AS ship_us
          FROM lineitem)
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range window frame (RANGE BETWEEN 30 days PRECEDING):
    per-supplier trailing-30-day shipped quantity. RANGE frames bound
    by the ORDER-BY *value*, not row offsets — same-valued peers enter
    the frame together, so no tie-break ordering is needed for
    determinism (unlike every ROWS frame in this module). One shuffle
    on l_suppkey; the frame scan is the standard sliding-aggregate
    window implementation in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    month_us = 30 * 24 * 3600 * 1_000_000
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(F.unix_micros(F.col("l_shipdate").cast("timestamp")))
        .rangeBetween(-month_us, Window.currentRow)
    )
    # NTZ -> TZ cast is identity under the pinned UTC session
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("ship_us"),
        F.sum(F.col("l_quantity").cast("decimal(27,4)"))
        .over(w)
        .cast("double")
        .alias("qty_30d"),
    )


@register(
    "sessionization_native",
    f"""
    WITH flagged AS (
      SELECT user_id, event_id, {_TS} AS ts,
             CASE WHEN epoch_us({_TS}) - epoch_us(LAG({_TS}) OVER w)
                       > {_SESSION_GAP_S} * 1000000
                  OR LAG({_TS}) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY {_TS}, event_id)
    ), sessions AS (
      SELECT user_id, event_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts)) + {_SESSION_GAP_S} * 1000000 AS session_end_us,
           count(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def sessionization_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window in batch mode, attested against
    the manual gap-construction oracle: proves the built-in operator's
    close-after-gap semantics (window end = last event + gap) equal
    the lag→flag→prefix-sum pipeline the `sessionization` query builds
    by hand — the two roads into SURVEY §2.5 meet. Same single
    user_id exchange; native session_window additionally merges in the
    streaming engine with state eviction (see streaming.stream)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window("ts", f"{_SESSION_GAP_S} seconds").alias("sw"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            F.unix_micros(F.col("sw.end")).alias("session_end_us"),
            "n_events",
        )
    )
