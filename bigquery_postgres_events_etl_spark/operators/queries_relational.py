"""Relational operator library (SURVEY §2.3-§2.8 rebuild layer).

The reference outsources every relational operation to BigQuery /
PostgreSQL SQL strings (SURVEY §2: "no joins, no group-by, no windows
exist locally"); this module supplies them as native Catalyst plans:
hash aggregation with map-side partials, broadcast joins for dims,
sort-merge for fact-fact, semi/anti joins (the dedup-writer primitive),
grouping sets/rollup/cube, pivot, set ops, and scalar string/case
expressions.

Scale notes (100 TB): dims (region/nation/part/supplier/customer) are
broadcast — no shuffle of the fact side; fact-fact joins shuffle on the
join key and AQE handles skew; every agg is partial+final so the
exchange carries pre-aggregated rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import davg, dsum
from ..io import load_table
from ..registry import register

# Exact-sum oracle fragment (see functions.scalars.dsum)
def _dsum_sql(expr: str, alias: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(27,{scale}))) AS DOUBLE) AS {alias}"


def _davg_sql(expr: str, alias: str, scale: int = 4) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(27,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


# ---------------------------------------------------------------------
# Aggregation pipelines (TPC-H-shaped headliners)
# ---------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum_sql('l_quantity', 'sum_qty')},
           {_dsum_sql('l_extendedprice', 'sum_base_price')},
           {_dsum_sql('CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))', 'sum_disc_price')},
           {_dsum_sql('CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))', 'sum_charge', 6)},
           {_davg_sql('l_quantity', 'avg_qty')},
           {_davg_sql('l_extendedprice', 'avg_price')},
           {_davg_sql('l_discount', 'avg_disc')},
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter → 2-key hash agg with 8 aggregates.
    Catalyst plans partial aggregation before the exchange, so the
    shuffle carries ≤ (flags×statuses) rows per task regardless of SF.

    The fixture money columns hold 2-decimal values, so disc_price and
    charge are computed in exact decimal arithmetic (cast the 2-decimal
    inputs, multiply in decimal) — a double product has 6 decimal
    digits and double→decimal rounding of such values TIES differently
    across engines (Java shortest-repr HALF_UP vs exact-binary-value
    rounding).
    """
    li = load_table(spark, sf_dir, "lineitem")
    ext = F.col("l_extendedprice").cast("decimal(18,2)")
    one = F.lit("1.00").cast("decimal(3,2)")
    disc_price = ext * (one - F.col("l_discount").cast("decimal(4,2)"))
    charge = disc_price * (one + F.col("l_tax").cast("decimal(4,2)"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge", scale=6),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    f"""
    SELECT l.l_orderkey AS o_orderkey,
           o.o_orderdate,
           o.o_orderpriority,
           {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: filtered joins → agg → top-k. customer and
    orders both scale with SF, so neither carries a broadcast hint —
    AQE broadcasts them at small SF and shuffle-joins at 100 TB (a
    forced broadcast of ~97% of orders would OOM executors there).
    The final top-10 is TakeOrderedAndProject, not a global sort.
    """
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o.join(c, o.o_custkey == c.c_custkey),
                li.l_orderkey == o.o_orderkey)
        .groupBy(
            li.l_orderkey.alias("o_orderkey"), o.o_orderdate, o.o_orderpriority
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    f"""
    SELECT n.n_name,
           {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table snowflake join. Only the truly bounded
    dims (region, nation⨝region ≤ |nation| rows) carry broadcast
    hints; customer/orders/supplier scale with SF and are unhinted —
    AQE broadcasts them at small SF, shuffles at 100 TB."""
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    nr = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    cnr = c.join(F.broadcast(nr), c.c_nationkey == nr.n_nationkey)
    ocnr = o.join(cnr, o.o_custkey == cnr.c_custkey)
    joined = li.join(ocnr, li.l_orderkey == ocnr.o_orderkey).join(
        s,
        (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == F.col("n_nationkey")),
    )
    return joined.groupBy("n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )


@register(
    "agg_global_stats",
    f"""
    SELECT count(*) AS n_rows,
           count(DISTINCT l_orderkey) AS n_orders,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty,
           {_dsum_sql('l_quantity', 'sum_qty')},
           {_davg_sql('l_extendedprice', 'avg_price')}
    FROM lineitem
    """,
)
def agg_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-key) aggregation — single-stage partial+final."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        dsum("l_quantity", "sum_qty"),
        davg("l_extendedprice", "avg_price"),
    )


@register(
    "agg_rollup",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           grouping(o_orderstatus) AS g_status,
           grouping(o_orderpriority) AS g_priority,
           count(*) AS n_orders,
           {_dsum_sql('o_totalprice', 'sum_price')}
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING markers — hierarchy subtotals in one pass
    (Catalyst expands to grouping sets, still partial-aggregated)."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
        F.grouping("o_orderpriority").cast("bigint").alias("g_priority"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "sum_price"),
    )


@register(
    "agg_cube",
    f"""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) AS g_flag,
           grouping(l_linestatus) AS g_status,
           count(*) AS n_items
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
        F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "pivot_priority_by_status",
    f"""
    SELECT o_orderpriority,
           {_dsum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END", 'O')},
           {_dsum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END", 'F')},
           {_dsum_sql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END", 'P')}
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (explicit list avoids the
    extra distinct-values job — required practice at scale)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum(F.col("o_totalprice").cast("decimal(27,4)")).cast("double"))
    )


# ---------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------


@register(
    "join_broadcast_dim",
    f"""
    SELECT p.p_brand,
           count(*) AS n_items,
           {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join fact⨝dim: the canonical star-schema join —
    the dim ships to every executor, the fact never shuffles. The
    choice is left to AQE/CBO (part has size stats from parquet): it
    broadcasts while part fits the threshold and degrades to a
    shuffle join, not an OOM, when it no longer does."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )


@register(
    "join_sort_merge_fact",
    f"""
    SELECT o.o_orderstatus,
           count(*) AS n_lineitems,
           {_dsum_sql('l.l_quantity', 'sum_qty')}
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def join_sort_merge_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join without a broadcast hint: Catalyst/AQE picks
    sort-merge (or shuffled-hash) on l_orderkey — the shuffle both
    sides share; at 100 TB this is where bucketing on orderkey would
    remove the exchange entirely."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_lineitems"), dsum("l_quantity", "sum_qty"))
    )


@register(
    "join_left_outer",
    """
    SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_semi",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI = EXISTS — returns each left row at most once; at
    scale semi-joins shuffle only the key column of the right side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, o.o_custkey == c.c_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI = NOT EXISTS — the primitive behind the idempotent
    conflict-skipping writer (reference K4: `ON CONFLICT DO NOTHING`,
    extract_bq.py:216-221 — new-batch left_anti existing-keys)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, o.o_custkey == c.c_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------
# Set operations (SURVEY §2.7 — rebuild layer)
# ---------------------------------------------------------------------

_BIG_ORDER = 400000.0


@register(
    "set_union",
    f"""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > {_BIG_ORDER}
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.where(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("custkey"))
        .union(o.where(F.col("o_totalprice") > _BIG_ORDER).select(F.col("o_custkey").alias("custkey")))
        .distinct()
    )


@register(
    "set_intersect",
    f"""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > {_BIG_ORDER}
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    ).intersect(
        o.where(F.col("o_totalprice") > _BIG_ORDER).select(F.col("o_custkey").alias("custkey"))
    )


@register(
    "set_except",
    f"""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > {_BIG_ORDER}
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    ).exceptAll(
        o.where(F.col("o_totalprice") > _BIG_ORDER).select(F.col("o_custkey").alias("custkey"))
    ).distinct()


@register(
    "distinct_segments",
    "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# ---------------------------------------------------------------------
# Scalar expressions (strings, case/when)
# ---------------------------------------------------------------------


@register(
    "string_functions",
    r"""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           length(p_name) AS name_len,
           substr(p_name, 1, 3) AS name_prefix,
           concat(p_brand, ':', p_type) AS brand_type,
           regexp_extract(p_name, '(\w+)$', 1) AS last_word,
           replace(p_name, ' ', '_') AS name_snake,
           string_split(p_name, ' ')[1] AS first_word
    FROM part
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-series scalar string functions — all codegen'd built-ins."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 3).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_name", r"(\w+)$", 1).alias("last_word"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
    )


@register(
    "case_when_bucketing",
    """
    SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 3000 THEN 'low'
                WHEN c_acctbal < 7000 THEN 'mid'
                ELSE 'high' END AS balance_bucket,
           count(*) AS n_customers,
           count(DISTINCT c_nationkey) AS n_nations
    FROM customer
    GROUP BY 1
    """,
)
def case_when_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    return c.groupBy(bucket.alias("balance_bucket")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
    )


@register(
    "part_pairs_cooccurrence",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS n_orders_together
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, n_orders_together
    FROM pairs
    WHERE n_orders_together >= 2
    ORDER BY n_orders_together DESC, part_a, part_b
    LIMIT 100
    """,
)
def part_pairs_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing in >= 2
    common orders, top-100 — the recommendation/affinity primitive.
    Inverted-index shape (same as the shingle join): distinct
    (order, part) -> self-join on the order key -> pair counts. Hot
    orders are bounded by order size (7 lineitems in TPC-H), so the
    per-key fan-out is constant — unlike hot shingles, no valve is
    needed; at 100 TB the pair aggregation is the only scaling
    shuffle and it carries co-occurring pairs only."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders_together"))
        .where(F.col("n_orders_together") >= 2)
        .orderBy(F.desc("n_orders_together"), "part_a", "part_b")
        .limit(100)
    )


@register(
    "part_association_rules",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    totals AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
    supp AS (
      SELECT l_partkey, count(*) AS n_part FROM items GROUP BY 1
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS n_ab
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= 2
    )
    SELECT part_a, part_b, n_ab,
           sa.n_part AS n_a, sb.n_part AS n_b,
           CAST(n_ab AS DOUBLE) / sa.n_part AS confidence,
           CAST(n_ab * t.n_orders AS DOUBLE) / (sa.n_part * sb.n_part) AS lift
    FROM pairs
    JOIN supp sa ON sa.l_partkey = part_a
    JOIN supp sb ON sb.l_partkey = part_b
    CROSS JOIN totals t
    ORDER BY lift DESC, part_a, part_b
    LIMIT 100
    """,
)
def part_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over the co-occurrence pairs: support counts,
    confidence P(b|a) and lift P(a,b)/(P(a)P(b)) — each an integer
    ratio with ONE deterministic IEEE division (lift multiplies the
    integers first so only the final division rounds). Adds two
    narrow joins to the co-occurrence plan: per-part supports
    (shuffled on partkey — the same key the pair aggregation already
    produced) and a 1-row order-count scalar; ranked by lift with a
    total tie-break. At 100 TB the pair table still carries only
    co-occurring pairs (bounded per-order fan-out), supports are
    |parts|-sized, and the scalar is free."""
    li = load_table(spark, sf_dir, "lineitem")
    # persisted post-distinct basket sliver (two longs/row): FIVE
    # consumers (order count, supports, both join arms) would each
    # re-scan lineitem otherwise (the repeated-scan class)
    items = li.select("l_orderkey", "l_partkey").distinct().persist()
    n_orders = items.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    supp = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 2)
    )
    sa = supp.select(F.col("l_partkey").alias("part_a"), F.col("n_part").alias("n_a"))
    sb = supp.select(F.col("l_partkey").alias("part_b"), F.col("n_part").alias("n_b"))
    return (
        pairs.join(sa, "part_a")
        .join(sb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            (F.col("n_ab").cast("double") / F.col("n_a")).alias("confidence"),
            (
                (F.col("n_ab") * F.col("n_orders")).cast("double")
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(100)
    )


@register(
    "part_similarity_topk",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    freq AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_orders FROM items GROUP BY 1
    ),
    pairs AS (
      SELECT a.l_partkey AS part, b.l_partkey AS neighbor,
             CAST(count(*) AS BIGINT) AS n_together
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT p.part, p.neighbor, p.n_together,
             CAST(p.n_together AS DOUBLE)
               / sqrt(CAST(fa.n_orders AS DOUBLE) * CAST(fb.n_orders AS DOUBLE)) AS cosine
      FROM pairs p
      JOIN freq fa ON p.part = fa.l_partkey
      JOIN freq fb ON p.neighbor = fb.l_partkey
      WHERE p.n_together >= 2
    ),
    ranked AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY part ORDER BY cosine DESC, neighbor) AS BIGINT) AS rnk
      FROM scored
    )
    SELECT part, neighbor, n_together, cosine, rnk
    FROM ranked WHERE rnk <= 5
    """,
)
def part_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-to-item collaborative filtering ("customers also bought"):
    cosine similarity over order-basket co-occurrence —
    cooc(i,j)/sqrt(n_i·n_j) — top-5 neighbors per part with a
    deterministic tie-break. The Amazon-style item-item recommender
    in its batch-precompute shape.

    Scale: same inverted-index self-join as part_pairs_cooccurrence
    (per-order fan-out bounded by basket size), frequencies are a
    |parts|-row re-agg of the SAME distinct-items frame (ReusedExchange
    at runtime), the per-item ranking window partitions by part. The
    min-support 2 filter prunes the pair tail BEFORE ranking — at
    100 TB the ranked set carries only genuinely co-bought pairs."""
    li = load_table(spark, sf_dir, "lineitem")
    # persisted post-distinct basket sliver — four consumers (freq +
    # both join arms) re-scanned lineitem otherwise
    items = li.select("l_orderkey", "l_partkey").distinct().persist()
    freq = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_orders"))
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("neighbor"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("part") != F.col("neighbor"))
        .groupBy("part", "neighbor")
        .agg(F.count(F.lit(1)).alias("n_together"))
        .where(F.col("n_together") >= 2)
    )
    scored = (
        pairs.join(freq.select(F.col("l_partkey").alias("part"), F.col("n_orders").alias("na")), "part")
        .join(freq.select(F.col("l_partkey").alias("neighbor"), F.col("n_orders").alias("nb")), "neighbor")
        .select(
            "part", "neighbor", "n_together",
            (
                F.col("n_together").cast("double")
                / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("part").orderBy(F.desc("cosine"), F.asc("neighbor"))
    return (
        scored.select("*", F.row_number().over(w).cast("long").alias("rnk"))
        .where(F.col("rnk") <= 5)
    )
