"""ETL-parity queries (SURVEY §2.1-§2.2, §2.4, §2.6, §2.8) over the
fixture ``events`` table, each with a DuckDB oracle twin.

These are the reference's own data operations re-expressed as
declarative Spark plans: projection P1, param extraction P2, filters
F1-F5, running-max watermark A1, counts A2, sorts/top-k O1, scalar
functions X2/X4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import dsum, json_param, to_shard_suffix
from ..io import load_table
from ..registry import register
from ..schemas import FIXTURE_TRACKED_EVENTS
from .etl import (
    date_range_filter,
    flagship_pipeline,
    tracked_events_filter,
    valid_user_filter,
    watermark_filter,
)

_TRACKED_SQL = ", ".join(f"'{e}'" for e in FIXTURE_TRACKED_EVENTS)
# mid-window watermark over the fixtures' 2024-01 event-time axis
WATERMARK_US = 1705276800000000  # 2024-01-15 00:00:00 UTC

# In oracle SQL, events.ts is TIMESTAMP_NS — cast to µs first so both
# engines compare identical instants.
_TS = "CAST(ts AS TIMESTAMP)"


@register(
    "etl_flagship",
    f"""
    WITH filtered AS (
      SELECT user_id,
             CAST({_TS} AS DATE) AS event_date,
             epoch_us({_TS}) AS event_timestamp,
             event_type AS event_name,
             CAST(event_id AS VARCHAR) AS event_id,
             json_extract_string(props, '$.k') AS event_name_detail,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, epoch_us({_TS}), event_type
               ORDER BY event_id
             ) AS rn
      FROM events
      WHERE user_id IS NOT NULL AND event_type IN ({_TRACKED_SQL})
    )
    SELECT user_id, event_date, event_timestamp, event_name, event_id,
           event_name_detail
    FROM filtered WHERE rn = 1
    """,
)
def etl_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP1/EP2 end-to-end: filters → param extraction → projection →
    deterministic dedup (reference: extract_bq.py:86-185)."""
    return flagship_pipeline(load_table(spark, sf_dir, "events"))


@register(
    "filter_valid_users",
    "SELECT event_id, user_id, event_type, value FROM events WHERE user_id IS NOT NULL",
)
def filter_valid_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2 — NULL/empty user rejection (reference: extract_bq.py:111-112)."""
    df = valid_user_filter(load_table(spark, sf_dir, "events"))
    return df.select("event_id", "user_id", "event_type", "value")


@register(
    "filter_tracked_events",
    f"SELECT event_id, user_id, event_type FROM events WHERE event_type IN ({_TRACKED_SQL})",
)
def filter_tracked_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 — set-membership filter (reference: extract_bq.py:89-93,113)."""
    df = tracked_events_filter(load_table(spark, sf_dir, "events"), FIXTURE_TRACKED_EVENTS)
    return df.select("event_id", "user_id", "event_type")


@register(
    "filter_watermark",
    f"""
    SELECT event_id, user_id, event_type, epoch_us({_TS}) AS ts_us
    FROM events WHERE epoch_us({_TS}) > {WATERMARK_US}
    """,
)
def filter_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — incremental high-water-mark predicate
    (reference: flask_server.py:151)."""
    df = watermark_filter(load_table(spark, sf_dir, "events"), WATERMARK_US)
    return df.select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )


@register(
    "filter_date_range",
    f"""
    SELECT event_id, user_id, event_type, CAST({_TS} AS DATE) AS event_date
    FROM events
    WHERE CAST({_TS} AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-10'
    """,
)
def filter_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/F5 — `_TABLE_SUFFIX BETWEEN` shard pruning re-expressed as a
    partition-prunable date predicate (reference: extract_bq.py:98-110)."""
    df = date_range_filter(load_table(spark, sf_dir, "events"), "2024-01-05", "2024-01-10")
    return df.select(
        "event_id", "user_id", "event_type", F.to_date("ts").alias("event_date")
    )


@register(
    "param_extract_json",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS event_k,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS event_k_int,
           json_extract_string(props, '$.missing') AS missing_param
    FROM events
    """,
)
def param_extract_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 (JSON variant) — nested param extraction; absent key → NULL
    (reference: extract_bq.py:159-164)."""
    df = load_table(spark, sf_dir, "events")
    return df.select(
        "event_id",
        json_param("props", "k").alias("event_k"),
        json_param("props", "k").cast("int").alias("event_k_int"),
        json_param("props", "missing").alias("missing_param"),
    )


@register(
    "sort_topk_events",
    f"""
    SELECT event_id, user_id, event_type, epoch_us({_TS}) AS ts_us
    FROM events ORDER BY ts_us DESC, event_id LIMIT 100
    """,
)
def sort_topk_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 + top-k — global sort DESC with LIMIT; Spark plans
    TakeOrderedAndProject (no full global sort at scale).
    (reference: extract_bq.py:114)."""
    df = load_table(spark, sf_dir, "events")
    return (
        df.select(
            "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
        )
        .orderBy(F.desc("ts_us"), F.asc("event_id"))
        .limit(100)
    )


@register(
    "watermark_running_max",
    f"""
    SELECT max(epoch_us({_TS})) AS max_ts_us,
           count(*) AS n_rows
    FROM events WHERE user_id IS NOT NULL
    """,
)
def watermark_running_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2 — the watermark-advance aggregate: running max + fetched
    count, as one distributed agg instead of a Python loop
    (reference: flask_server.py:161,184-185)."""
    df = valid_user_filter(load_table(spark, sf_dir, "events"))
    return df.agg(
        F.max(F.unix_micros("ts")).alias("max_ts_us"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "event_counts_by_type",
    """
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def event_counts_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3 generalized to hash aggregation (the reference counts only
    in Python loops; Spark does partial+final agg map-side)."""
    df = load_table(spark, sf_dir, "events")
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dsum("value", "sum_value"),
    )


@register(
    "csv_projection",
    f"""
    SELECT user_id,
           CAST({_TS} AS DATE) AS event_date,
           epoch_us({_TS}) AS event_timestamp,
           event_type AS event_name,
           CAST(event_id AS VARCHAR) AS event_id,
           json_extract_string(props, '$.k') AS event_name_detail
    FROM events
    """,
)
def csv_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/K1 — the exact CSV export column set and order
    (reference: extract_bq.py:149)."""
    df = load_table(spark, sf_dir, "events")
    return df.select(
        "user_id",
        F.to_date("ts").alias("event_date"),
        F.unix_micros("ts").alias("event_timestamp"),
        F.col("event_type").alias("event_name"),
        F.col("event_id").cast("string").alias("event_id"),
        json_param("props", "k").alias("event_name_detail"),
    )


@register(
    "scalar_date_functions",
    f"""
    SELECT event_id,
           strftime({_TS}, '%Y%m%d') AS shard_suffix,
           epoch_us({_TS}) AS ts_us,
           make_timestamp(epoch_us({_TS})) AS ts_roundtrip,
           CAST(strptime('2024/01/15', '%Y/%m/%d') AS DATE) AS parsed_multi
    FROM events
    """,
)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1-X4 — date→shard-suffix, µs-epoch round-trip, multi-format
    date parse (reference: extract_bq.py:99-100,278-288;
    flask_server.py:66,96)."""
    from ..functions.scalars import micros_to_ts, parse_date_multi, ts_to_micros

    df = load_table(spark, sf_dir, "events")
    return df.select(
        "event_id",
        to_shard_suffix("ts").alias("shard_suffix"),
        ts_to_micros("ts").alias("ts_us"),
        micros_to_ts(ts_to_micros("ts")).alias("ts_roundtrip"),
        parse_date_multi(F.lit("2024/01/15")).alias("parsed_multi"),
    )


@register(
    "etl_struct_params",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS event_k,
           json_extract_string(props, '$.missing') AS event_missing
    FROM events
    """,
)
def etl_struct_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 struct-path parity, oracle-checked: rebuild the GA4
    ARRAY<STRUCT<key, value<string_value>>> shape from the fixture's
    JSON props, then extract with the exact last-wins struct logic
    the reference uses (extract_bq.py:159-164). The oracle reads the
    JSON directly — equal output proves the struct path is faithful.
    """
    from ..functions.scalars import param_last_wins

    df = load_table(spark, sf_dir, "events")
    params = F.array(
        F.struct(
            F.lit("k").alias("key"),
            F.struct(json_param("props", "k").alias("string_value")).alias("value"),
        )
    )
    return df.withColumn("event_params", params).select(
        "event_id",
        param_last_wins("event_params", "k").alias("event_k"),
        param_last_wins("event_params", "missing").alias("event_missing"),
    )


@register(
    "funnel_conversion",
    f"""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS n_clicks,
           count(*) FILTER (WHERE event_type = 'view') AS n_views,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           CASE WHEN count(*) FILTER (WHERE event_type = 'purchase') > 0
                 AND count(*) FILTER (WHERE event_type = 'click') > 0
                THEN 1 ELSE 0 END AS converted,
           epoch_us(min({_TS}) FILTER (WHERE event_type = 'purchase')) AS first_purchase_us
    FROM events
    WHERE user_id IS NOT NULL
    GROUP BY user_id
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed analytics pipeline: per-user funnel counts +
    conversion flag + first-purchase time, one conditional-agg pass
    (the shape of the reference's downstream analytics queries)."""
    e = valid_user_filter(load_table(spark, sf_dir, "events"))
    purchase = F.col("event_type") == "purchase"
    n_purch = F.count_if(purchase)
    n_click = F.count_if(F.col("event_type") == "click")
    return e.groupBy("user_id").agg(
        n_click.alias("n_clicks"),
        F.count_if(F.col("event_type") == "view").alias("n_views"),
        n_purch.alias("n_purchases"),
        F.when((n_purch > 0) & (n_click > 0), 1).otherwise(0).alias("converted"),
        F.unix_micros(F.min(F.when(purchase, F.col("ts")))).alias("first_purchase_us"),
    )


@register(
    "profile_columns",
    f"""
    SELECT count(*) AS n_rows,
           count(*) - count(user_id) AS user_id_nulls,
           count(DISTINCT user_id) AS user_id_distinct,
           count(*) - count(value) AS value_nulls,
           count(DISTINCT event_type) AS event_type_distinct,
           min(epoch_us({_TS})) AS ts_min_us,
           max(epoch_us({_TS})) AS ts_max_us,
           CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) / count(value) AS value_mean
    FROM events
    """,
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profiling in one pass: null counts, distincts,
    ranges, means — the ingest-gate check a training-data pipeline
    runs before accepting a batch."""
    e = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros("ts")
    return e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("user_id")).alias("user_id_nulls"),
        F.countDistinct("user_id").alias("user_id_distinct"),
        (F.count(F.lit(1)) - F.count("value")).alias("value_nulls"),
        F.countDistinct("event_type").alias("event_type_distinct"),
        F.min(ts_us).alias("ts_min_us"),
        F.max(ts_us).alias("ts_max_us"),
        (F.sum(F.col("value").cast("decimal(27,4)")).cast("double") / F.count("value")).alias("value_mean"),
    )


@register(
    "dq_expectations_report",
    f"""
    WITH ev AS (
      SELECT count(*) FILTER (WHERE user_id IS NULL) AS v_null_user,
             count(*) FILTER (WHERE event_type NOT IN
               ('click','view','purchase','signup','error')) AS v_bad_type,
             count(*) FILTER (WHERE value < 0) AS v_neg_value,
             count(*) FILTER (WHERE {_TS} < TIMESTAMP '2024-01-01'
                                 OR {_TS} >= TIMESTAMP '2024-04-01') AS v_ts_range,
             count(*) - count(DISTINCT event_id) AS v_dup_id
      FROM events
    ),
    fk AS (
      SELECT count(*) AS v_orphans FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    ),
    rules AS (
      SELECT 'events_user_id_not_null' AS rule, v_null_user AS n_violations FROM ev
      UNION ALL SELECT 'events_type_in_allowed_set', v_bad_type FROM ev
      UNION ALL SELECT 'events_value_non_negative', v_neg_value FROM ev
      UNION ALL SELECT 'events_ts_in_expected_range', v_ts_range FROM ev
      UNION ALL SELECT 'events_event_id_unique', v_dup_id FROM ev
      UNION ALL SELECT 'orders_custkey_references_customer', v_orphans FROM fk
    )
    SELECT rule, n_violations,
           CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS passed
    FROM rules
    """,
)
def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based data-quality expectations suite (the Deequ/
    Great-Expectations shape; the reference validates each event row
    before insert, extract_bq.py's fetch loop — here the checks run
    as ONE declarative report): five single-pass conditional
    aggregates over events (stack-unpivoted from one agg row, so the
    fact is scanned once) plus a referential-integrity anti-join
    count on orders→customer. Output is one row per rule with the
    violation count and a pass flag — the ingest gate a 100 TB
    pipeline evaluates before promoting a batch, with no extra scan
    per rule."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    allowed = ["click", "view", "purchase", "signup", "error"]
    ev = e.agg(
        F.count_if(F.col("user_id").isNull()).alias("v_null_user"),
        F.count_if(~F.col("event_type").isin(allowed)).alias("v_bad_type"),
        F.count_if(F.col("value") < 0).alias("v_neg_value"),
        F.count_if(
            (F.col("ts") < F.lit("2024-01-01").cast("timestamp"))
            | (F.col("ts") >= F.lit("2024-04-01").cast("timestamp"))
        ).alias("v_ts_range"),
        (F.count(F.lit(1)) - F.countDistinct("event_id")).alias("v_dup_id"),
    )
    events_rules = ev.selectExpr(
        "stack(5, "
        "'events_user_id_not_null', v_null_user, "
        "'events_type_in_allowed_set', v_bad_type, "
        "'events_value_non_negative', v_neg_value, "
        "'events_ts_in_expected_range', v_ts_range, "
        "'events_event_id_unique', v_dup_id) AS (rule, n_violations)"
    )
    orphans = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("orders_custkey_references_customer").alias("rule"), "n_violations")
    )
    return events_rules.unionByName(orphans).select(
        "rule",
        "n_violations",
        F.when(F.col("n_violations") == 0, 1).otherwise(0).alias("passed"),
    )


@register(
    "etl_scd2_user_state",
    f"""
    WITH seq AS (
      SELECT user_id, event_type, {_TS} AS tsx, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY {_TS}, event_id) AS prev_type
      FROM events WHERE user_id IS NOT NULL
    ),
    isl AS (
      SELECT user_id, event_type, tsx, event_id,
             SUM(CASE WHEN prev_type IS NULL OR prev_type <> event_type
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY tsx, event_id
                     ROWS UNBOUNDED PRECEDING) AS island
      FROM seq
    ),
    runs AS (
      SELECT user_id, island, min(event_type) AS state,
             epoch_us(min(tsx)) AS valid_from_us,
             count(*) AS n_events
      FROM isl GROUP BY user_id, island
    )
    SELECT user_id, state, valid_from_us,
           LEAD(valid_from_us) OVER (PARTITION BY user_id
                                     ORDER BY island) AS valid_to_us,
           n_events,
           CASE WHEN LEAD(valid_from_us) OVER (PARTITION BY user_id
                                               ORDER BY island) IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM runs
    """,
)
def etl_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type-2 build (gaps-and-islands): each
    user's event_type run becomes a validity interval
    [valid_from, valid_to) with an is_current flag on the open run —
    the dimension-table shape a warehouse derives from an event
    stream. One lag window + one running-sum window + the interval
    aggregation + one lead window, ALL partitioned by user_id: a
    single user_id exchange serves every step (Catalyst reuses the
    sort), so at 100 TB this is one shuffle of the fact, no matter
    how many SCD columns are tracked."""
    from pyspark.sql import Window

    e = valid_user_filter(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")),
        1,
    ).otherwise(0)
    isl = e.withColumn("island", F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    runs = isl.groupBy("user_id", "island").agg(
        F.min("event_type").alias("state"),
        F.unix_micros(F.min("ts")).alias("valid_from_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wl = Window.partitionBy("user_id").orderBy("island")
    nxt = F.lead("valid_from_us").over(wl)
    return runs.select(
        "user_id",
        "state",
        "valid_from_us",
        nxt.alias("valid_to_us"),
        "n_events",
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


@register(
    "etl_snapshot_diff",
    """
    WITH old AS (
      SELECT o_custkey, count(*) AS old_n,
             SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS old_total
      FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY o_custkey
    ),
    new AS (
      SELECT o_custkey, count(*) AS new_n,
             SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS new_total
      FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01' GROUP BY o_custkey
    )
    SELECT COALESCE(new.o_custkey, old.o_custkey) AS o_custkey,
           old.old_n, new.new_n,
           CAST(old.old_total AS DOUBLE) AS old_total,
           CAST(new.new_total AS DOUBLE) AS new_total,
           CASE WHEN old.o_custkey IS NULL THEN 'insert'
                WHEN new.o_custkey IS NULL THEN 'delete'
                WHEN old.old_n <> new.new_n
                  OR old.old_total <> new.new_total THEN 'update'
                ELSE 'unchanged' END AS change_type
    FROM old FULL OUTER JOIN new ON old.o_custkey = new.o_custkey
    """,
)
def etl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot diff: per-customer order count + exact DECIMAL
    total at two as-of dates, full-outer-joined and classified
    insert / update / delete / unchanged — how a warehouse computes a
    changeset between two loads when the source has no changelog.
    Both snapshots derive from ONE orders scan (Catalyst reuses the
    exchange: both aggregates and the join share the o_custkey
    partitioning); equality tests run on the exact decimal sums, the
    doubles are only the output cast. Append-only orders means
    'delete' cannot occur here, but the branch is emitted so the
    operator is complete for mutable sources."""
    o = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(27,4)")

    def snap(cutoff: str, pfx: str) -> DataFrame:
        return (
            o.where(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp"))
            .groupBy("o_custkey")
            .agg(
                F.count(F.lit(1)).alias(f"{pfx}_n"),
                F.sum(dec).alias(f"{pfx}_total_dec"),
            )
        )

    old = snap("1998-01-01", "old")
    new = snap("1999-01-01", "new")
    joined = old.withColumnRenamed("o_custkey", "old_key").join(
        new.withColumnRenamed("o_custkey", "new_key"),
        F.col("old_key") == F.col("new_key"),
        "full_outer",
    )
    return joined.select(
        F.coalesce("new_key", "old_key").alias("o_custkey"),
        "old_n",
        "new_n",
        F.col("old_total_dec").cast("double").alias("old_total"),
        F.col("new_total_dec").cast("double").alias("new_total"),
        F.when(F.col("old_key").isNull(), "insert")
        .when(F.col("new_key").isNull(), "delete")
        .when(
            (F.col("old_n") != F.col("new_n"))
            | (F.col("old_total_dec") != F.col("new_total_dec")),
            "update",
        )
        .otherwise("unchanged")
        .alias("change_type"),
    )


# IVM delta boundary: orders strictly before the cutoff are the
# "stored" base state; the cutoff month is the arriving delta batch.
_IVM_CUTOFF = "2001-07-01"


@register(
    "ivm_join_delta_orders",
    f"""
    WITH enriched AS (
      SELECT c.c_mktsegment,
             CAST(date_trunc('month', o.o_orderdate) AS DATE) AS order_month,
             o.o_totalprice, o.o_orderdate
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    base AS (
      SELECT c_mktsegment, order_month,
             count(*) AS n_orders,
             SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS total_dec
      FROM enriched WHERE o_orderdate < TIMESTAMP '{_IVM_CUTOFF}'
      GROUP BY 1, 2
    ),
    delta AS (
      SELECT c_mktsegment, order_month,
             count(*) AS n_orders,
             SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS total_dec
      FROM enriched WHERE o_orderdate >= TIMESTAMP '{_IVM_CUTOFF}'
      GROUP BY 1, 2
    ),
    merged AS (
      SELECT c_mktsegment, order_month, n_orders, total_dec FROM base
      UNION ALL
      SELECT c_mktsegment, order_month, n_orders, total_dec FROM delta
    )
    SELECT c_mktsegment, order_month,
           CAST(sum(n_orders) AS BIGINT) AS n_orders,
           CAST(CAST(CAST(sum(total_dec) AS DECIMAL(27,4)) AS VARCHAR) AS DOUBLE) AS total_price
    FROM merged GROUP BY 1, 2
    """,
)
def ivm_join_delta_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN view (ΔV = Δfact ⨝ dim
    folded into stored state — the join-shaped sibling of
    ``events_mergeable_daily_rollup``): the materialized view is
    per-(segment, month) order count + exact revenue; when the cutoff
    month's orders arrive, ONLY the delta batch joins the customer
    dimension and aggregates, and the view updates by state merge
    (counts add, decimal sums add). The oracle recomputes the view
    from the full joined history, so the hash match proves
    agg(base ⨝ dim) ⊎ agg(Δ ⨝ dim) = agg((base ∪ Δ) ⨝ dim) — the
    classical IVM distributivity this plan relies on.

    Scale: at 100 TB the base state is a stored table read once per
    refresh (here recomputed from the pre-cutoff scan to stay
    self-contained); work per refresh is O(|Δ| + |state slice|), not
    O(history). The dimension side is unhinted — AQE broadcasts while
    it is small; at dimension scale the delta join shuffles only the
    day's batch."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cutoff = F.lit(_IVM_CUTOFF).cast("timestamp")

    def state(part: DataFrame) -> DataFrame:
        return (
            part.join(cust, part["o_custkey"] == cust["c_custkey"])
            .groupBy(
                "c_mktsegment",
                F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(27,4)")).alias("total_dec"),
            )
        )

    base = state(orders.where(F.col("o_orderdate") < cutoff))
    delta = state(orders.where(F.col("o_orderdate") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("c_mktsegment", "order_month")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("total_dec")
            .cast("decimal(27,4)")
            .cast("string")
            .cast("double")
            .alias("total_price"),
        )
    )


K_ANONYMITY_K = 5  # the conventional minimum cohort size
K_ANON_LEN_BUCKET = 256  # chars per length bucket (a quasi-identifier)


@register(
    "dq_k_anonymity",
    f"""
    WITH g AS (
      SELECT lang, source,
             CAST(n_chars // {K_ANON_LEN_BUCKET} AS BIGINT) AS len_bucket,
             CAST(COUNT(*) AS BIGINT) AS group_size
      FROM documents GROUP BY 1, 2, 3
    ),
    tot AS (SELECT CAST(SUM(group_size) AS BIGINT) AS n_docs FROM g)
    SELECT g.lang, g.source, g.len_bucket, g.group_size,
           g.group_size < {K_ANONYMITY_K} AS violates_k,
           CASE WHEN g.group_size < {K_ANONYMITY_K}
                THEN g.group_size ELSE 0 END AS docs_to_suppress,
           CAST(g.group_size AS DOUBLE) / t.n_docs AS population_share
    FROM g, tot t
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the corpus's quasi-identifiers — the
    privacy-governance gate a pipeline runs before releasing
    per-document metadata: every (lang, source, length-bucket) cohort
    with fewer than k members re-identifies its documents, so the
    audit emits each cohort's size, whether it violates k, and how
    many documents generalization/suppression must touch (the
    Sweeney k-anonymity model; companions: text_pii_scan for content,
    pipeline_pseudonymize for identifiers, lakehouse.purge_keys for
    erasure).

    Plan: one hash aggregation over a three-column sliver (the
    quasi-identifier cardinality, bounded by vocabulary × buckets,
    never by documents) + a 1-row total broadcast back — integers,
    one final IEEE share division; fully hash-oracle-able."""
    docs = load_table(spark, sf_dir, "documents")
    g = (
        docs.groupBy(
            "lang",
            "source",
            F.expr(f"CAST(n_chars div {K_ANON_LEN_BUCKET} AS BIGINT)").alias(
                "len_bucket"
            ),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("group_size"))
    )
    tot = g.agg(F.sum("group_size").cast("long").alias("n_docs"))
    return g.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "len_bucket",
        "group_size",
        (F.col("group_size") < K_ANONYMITY_K).alias("violates_k"),
        F.when(F.col("group_size") < K_ANONYMITY_K, F.col("group_size"))
        .otherwise(F.lit(0).cast("long"))
        .alias("docs_to_suppress"),
        (F.col("group_size").cast("double") / F.col("n_docs").cast("double")).alias(
            "population_share"
        ),
    )


L_DIVERSITY_L = 3  # distinct sensitive values a cohort must contain


@register(
    "dq_l_diversity",
    f"""
    WITH sv AS (
      SELECT lang,
             CAST(n_chars // {K_ANON_LEN_BUCKET} AS BIGINT) AS len_bucket,
             source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2, 3
    )
    SELECT lang, len_bucket,
           CAST(SUM(n) AS BIGINT) AS group_size,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_sensitive,
           COUNT(*) < {L_DIVERSITY_L} AS violates_l,
           CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS dominant_share
    FROM sv GROUP BY 1, 2
    """,
)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — k-anonymity's companion (Machanavajjhala
    et al. 2007): a cohort can satisfy k yet still leak when every
    member shares one SENSITIVE value, so each quasi-identifier
    cohort (lang × length-bucket) must contain ≥ l distinct sensitive
    values (``source`` plays the sensitive attribute). Emits cohort
    size, distinct-sensitive count, the violation flag, and the
    dominant single-value share (the log-free skew signal entropy-
    l-diversity would monitor — exact integers, one IEEE division).

    Plan: two stacked hash aggregations over a three-column sliver —
    the first collapses to (cohort × sensitive) cardinality, the
    second to cohort cardinality; both partial-aggregated, bounded by
    vocabulary products, never by document count."""
    docs = load_table(spark, sf_dir, "documents")
    sv = docs.groupBy(
        "lang",
        F.expr(f"CAST(n_chars div {K_ANON_LEN_BUCKET} AS BIGINT)").alias(
            "len_bucket"
        ),
        "source",
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return sv.groupBy("lang", "len_bucket").agg(
        F.sum("n").cast("long").alias("group_size"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_sensitive"),
        (F.count(F.lit(1)) < L_DIVERSITY_L).alias("violates_l"),
        (F.max("n").cast("double") / F.sum("n").cast("double")).alias(
            "dominant_share"
        ),
    )


# t = T_CLOSENESS_NUM / T_CLOSENESS_DEN — the max allowed total-
# variation distance between a cohort's sensitive distribution and
# the global one (Li, Li & Venkatasubramanian 2007 use t = 0.2 in
# the running example)
T_CLOSENESS_NUM = 1
T_CLOSENESS_DEN = 5


@register(
    "dq_t_closeness",
    f"""
    WITH sv AS (
      SELECT lang,
             CAST(n_chars // {K_ANON_LEN_BUCKET} AS BIGINT) AS len_bucket,
             source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2, 3
    ),
    coh AS (
      SELECT lang, len_bucket, CAST(SUM(n) AS BIGINT) AS n_c
      FROM sv GROUP BY 1, 2
    ),
    gsrc AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS g_v FROM documents GROUP BY 1
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    grid AS (
      SELECT c.lang, c.len_bucket, c.n_c, g.source, g.g_v,
             COALESCE(s.n, 0) AS n_cv, t.n
      FROM coh c CROSS JOIN gsrc g CROSS JOIN tot t
      LEFT JOIN sv s ON s.lang = c.lang AND s.len_bucket = c.len_bucket
                    AND s.source = g.source
    )
    SELECT lang, len_bucket,
           CAST(MAX(n_c) AS BIGINT) AS group_size,
           CAST(SUM(ABS(n_cv * n - g_v * n_c)) AS BIGINT) AS tvd_num,
           CAST(SUM(ABS(n_cv * n - g_v * n_c)) AS DOUBLE)
             / CAST(2 * MAX(n_c) * MAX(n) AS DOUBLE) AS tvd,
           SUM(ABS(n_cv * n - g_v * n_c)) * {T_CLOSENESS_DEN}
             > CAST(2 * {T_CLOSENESS_NUM} AS BIGINT) * MAX(n_c) * MAX(n)
             AS violates_t
    FROM grid GROUP BY 1, 2
    """,
)
def dq_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) —
    completes the privacy trio beside dq_k_anonymity and
    dq_l_diversity: a cohort can satisfy k AND l yet still leak when
    its sensitive-value DISTRIBUTION diverges from the global one
    (the skewness/similarity attacks). Per quasi-identifier cohort
    (lang × length-bucket), the total-variation distance between the
    cohort's ``source`` distribution and the corpus-wide one must be
    ≤ t = 1/5.

    Exact-integer design: TVD = ½ Σ_v |n_cv/n_c − g_v/N| =
    Σ_v |n_cv·N − g_v·n_c| / (2·n_c·N) — the numerators are exact
    BIGINTs summed over the source VOCABULARY (absent values
    contribute g_v·n_c, hence the vocab grid), so the violation flag
    compares pure integers (5·Σ > 2·n_c·N) and the reported tvd is
    ONE final IEEE division. No decimal casting anywhere.

    Plan: the l-diversity sliver plus a vocabulary-sized cross join
    (|cohorts| × |sources| rows — both vocab-bounded, broadcast) and
    one left join back onto the sliver; never document-count-sized."""
    docs = load_table(spark, sf_dir, "documents")
    sv = docs.groupBy(
        "lang",
        F.expr(f"CAST(n_chars div {K_ANON_LEN_BUCKET} AS BIGINT)").alias(
            "len_bucket"
        ),
        "source",
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    coh = sv.groupBy("lang", "len_bucket").agg(
        F.sum("n").cast("long").alias("n_c")
    )
    glob = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("g_v")
    )
    tot = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    grid = (
        coh.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(tot))
        .join(
            sv.withColumnRenamed("n", "n_cv"),
            ["lang", "len_bucket", "source"],
            "left",
        )
        .withColumn("n_cv", F.coalesce(F.col("n_cv"), F.lit(0)))
    )
    term = F.abs(F.col("n_cv") * F.col("n") - F.col("g_v") * F.col("n_c"))
    return grid.groupBy("lang", "len_bucket").agg(
        F.max("n_c").cast("long").alias("group_size"),
        F.sum(term).cast("long").alias("tvd_num"),
        (
            F.sum(term).cast("double")
            / (2 * F.max("n_c") * F.max("n")).cast("double")
        ).alias("tvd"),
        (
            F.sum(term) * T_CLOSENESS_DEN
            > 2 * T_CLOSENESS_NUM * F.max("n_c") * F.max("n")
        ).alias("violates_t"),
    )


@register(
    "dq_referential_integrity",
    """
    WITH rels AS (
      SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS relationship,
             (SELECT COUNT(*) FROM lineitem) AS n_child_rows,
             (SELECT COUNT(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))
               AS n_orphan_rows,
             (SELECT COUNT(DISTINCT l.l_orderkey) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))
               AS n_orphan_keys
      UNION ALL
      SELECT 'orders.o_custkey->customer.c_custkey',
             (SELECT COUNT(*) FROM orders),
             (SELECT COUNT(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey)),
             (SELECT COUNT(DISTINCT o.o_custkey) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey))
      UNION ALL
      SELECT 'lineitem.l_partkey->part.p_partkey',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM part p
                                WHERE p.p_partkey = l.l_partkey)),
             (SELECT COUNT(DISTINCT l.l_partkey) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM part p
                                WHERE p.p_partkey = l.l_partkey))
    )
    SELECT relationship,
           CAST(n_child_rows AS BIGINT) AS n_child_rows,
           CAST(n_orphan_rows AS BIGINT) AS n_orphan_rows,
           CAST(n_orphan_keys AS BIGINT) AS n_orphan_keys,
           n_orphan_rows = 0 AS intact
    FROM rels
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the warehouse FK chain
    (lineitem→orders, orders→customer, lineitem→part): per
    relationship the child-row count, orphan rows (no matching
    parent), distinct orphan keys, and an intact verdict — the DQ
    gate that catches a partial parent load before downstream joins
    silently drop rows. Three LEFT-ANTI probes, each a key-sliver
    join with the parent side reduced to its key column; all-integer
    output."""

    def rel(name, child, ckey, parent, pkey):
        c = load_table(spark, sf_dir, child).select(F.col(ckey))
        p = load_table(spark, sf_dir, parent).select(F.col(pkey).alias(ckey))
        orphans = c.join(p, ckey, "left_anti")
        return (
            c.agg(F.count(F.lit(1)).cast("long").alias("n_child_rows"))
            .crossJoin(
                F.broadcast(
                    orphans.agg(
                        F.count(F.lit(1)).cast("long").alias("n_orphan_rows"),
                        F.countDistinct(ckey).cast("long").alias("n_orphan_keys"),
                    )
                )
            )
            .select(
                F.lit(name).alias("relationship"),
                "n_child_rows",
                "n_orphan_rows",
                "n_orphan_keys",
                (F.col("n_orphan_rows") == 0).alias("intact"),
            )
        )

    return (
        rel("lineitem.l_orderkey->orders.o_orderkey",
            "lineitem", "l_orderkey", "orders", "o_orderkey")
        .unionAll(rel("orders.o_custkey->customer.c_custkey",
                      "orders", "o_custkey", "customer", "c_custkey"))
        .unionAll(rel("lineitem.l_partkey->part.p_partkey",
                      "lineitem", "l_partkey", "part", "p_partkey"))
    )
