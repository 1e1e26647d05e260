"""TPC-H-shaped analytics queries beyond Q1/Q3/Q5 — the subset whose
required columns exist in the driver fixtures. Q2/Q9/Q11/Q16/Q20 live
in queries_tpch_ps.py over a deterministically synthesized partsupp;
Q4/Q12/Q19/Q21 remain TRULY fixture-blocked: they need lineitem
columns the fixtures do not carry and that cannot be synthesized
consistently with the existing data (Q4/Q12/Q21 require
l_commitdate/l_receiptdate — inventing them would fabricate the very
late-vs-committed signal the queries measure; Q12 and Q19 also need
l_shipmode/l_shipinstruct/p_container).

All follow the same scale discipline: only genuinely bounded dims
(nation, region - constant-cardinality) carry explicit broadcast
hints; customer/supplier/part/orders scale with SF, so their join
strategy is left to Catalyst/AQE (broadcast at small SF, shuffle at
100 TB - a forced hint would OOM executors there). Money math in
exact decimals, deterministic tie-breaks on every ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

_REV = "CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))"
_REV_SUM = f"CAST(SUM(CAST({_REV} AS DECIMAL(27,4))) AS DOUBLE)"


def _rev_col() -> F.Column:
    one = F.lit("1.00").cast("decimal(3,2)")
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        one - F.col("l_discount").cast("decimal(4,2)")
    )


def _dsum_rev(alias: str):
    return F.sum(_rev_col().cast("decimal(27,4)")).cast("double").alias(alias)


@register(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year, {_REV_SUM.replace('l.l_', 'l_')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
             l.l_extendedprice, l.l_discount
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume (fixture nations NATION_1/NATION_2) by year. Nation dim joins
    twice (supplier side, customer side) — both broadcast (bounded
    dim); supplier/customer joins are unhinted (AQE decides)."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(_dsum_rev("revenue"))


@register(
    "q8_market_share",
    f"""
    WITH all_nations AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             CAST({_REV} AS DECIMAL(27,4)) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'STANDARD'
        AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                              AND TIMESTAMP '1996-12-31 00:00:00'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM all_nations GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share inside a region — 8-table
    snowflake with a conditional-share aggregate (exact decimal
    volumes; one double division at the end)."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(
            F.lit("1995-01-01").cast("timestamp"), F.lit("1996-12-31").cast("timestamp")
        )
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    vol = _rev_col().cast("decimal(27,4)")
    german = F.when(F.col("nation") == "NATION_2", vol).otherwise(
        F.lit(0).cast("decimal(27,4)")
    )
    return (
        joined.select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), german.alias("gvol"))
        .groupBy("o_year")
        .agg(
            (F.sum("gvol").cast("double") / F.sum("volume").cast("double")).alias("mkt_share")
        )
    )


@register(
    "q10_returned_items",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name, c.c_acctbal,
           {_REV_SUM} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-item revenue —
    join + agg + TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(_dsum_rev("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_revenue",
    f"""
    SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST({_REV} AS DECIMAL(27,4))
                         ELSE CAST(0 AS DECIMAL(27,4)) END) AS DOUBLE) * 100.0
             / CAST(SUM(CAST({_REV} AS DECIMAL(27,4))) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share for one month (part join
    unhinted — AQE broadcasts it at small SF; conditional
    exact-decimal sums; final double arithmetic in the same operation
    order as the oracle)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    vol = _rev_col().cast("decimal(27,4)")
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(
        F.lit(0).cast("decimal(27,4)")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .select(vol.alias("vol"), promo.alias("pvol"))
        .agg(
            (F.sum("pvol").cast("double") * F.lit(100.0) / F.sum("vol").cast("double")).alias(
                "promo_revenue_pct"
            )
        )
    )


@register(
    "q18_large_orders",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(27,4))) > 150
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-quantity orders, in the spec's own shape —
    aggregate lineitem on the NARROW orderkey first, filter hard
    (HAVING > 150 keeps a sliver), then join the sliver to orders and
    customer. The naive join-then-group-by-5-columns plan shuffles
    every joined row on a wide key (the r1 bench's single largest
    exchange, 5.3 MB at sf0.1 → TBs at 100×); this shape shuffles
    lineitem once on orderkey with map-side partial sums, and the
    post-filter join side is small enough that AQE broadcasts it.
    (orderkey groups are unique per order, so sum_qty is identical —
    the oracle SQL is unchanged and still hash-matches.)"""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    qual = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(27,4)")).cast("double").alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    return (
        qual.join(o, qual.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(
             CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))
           AS DECIMAL(27,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + global sum — the pushdown showcase (all
    three predicates reach the parquet scan; zero joins, one scalar
    exchange). Product computed in decimal from the 2-decimal inputs
    (cross-engine tie safety)."""
    li = load_table(spark, sf_dir, "lineitem")
    prod = F.col("l_extendedprice").cast("decimal(18,2)") * F.col("l_discount").cast(
        "decimal(4,2)"
    )
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(prod.cast("decimal(27,4)")).cast("double").alias("revenue"))
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (sans the comment filter — the fixture has no
    o_comment): distribution of per-customer order counts. Two
    aggregations; the second groups the tiny per-customer counts."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no, {_REV_SUM.replace('l.l_', 'l_')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the quarter's max revenue. The max
    is a 1-row scalar joined back (broadcast by AQE); revenue equality
    is exact because both engines produce the identical decimal-sum
    double."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dsum_rev("total_revenue")
    )
    max_rev = rev.agg(F.max("total_revenue").alias("mr"))
    return (
        s.join(rev, s.s_suppkey == rev.supplier_no)
        .join(max_rev, rev.total_revenue == max_rev.mr)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(27,4))) AS DOUBLE)
             / CAST(7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey,
             CAST(0.2 AS DOUBLE)
               * (CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE)
                  / count(*)) AS qty_limit
      FROM lineitem GROUP BY l_partkey
    ) t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < t.qty_limit
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from below-20%-of-average-quantity orders of
    one brand. The correlated scalar subquery becomes a per-part
    aggregate joined back; the average goes through the exact decimal
    sum so the 0.2× threshold is bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    limits = li.groupBy(F.col("l_partkey").alias("lim_partkey")).agg(
        (
            F.lit(0.2).cast("double")
            * (
                F.sum(F.col("l_quantity").cast("decimal(27,4)")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("qty_limit")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(limits, li.l_partkey == F.col("lim_partkey"))
        .where(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(27,4)")).cast("double")
                / F.lit(7.0).cast("double")
            ).alias("avg_yearly")
        )
    )


@register(
    "q22_global_sales_opportunity",
    """
    WITH eligible AS (
      SELECT c_custkey, c_nationkey, c_acctbal FROM customer
      WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,4))) AS DOUBLE) / count(*)
        FROM customer WHERE c_acctbal > 0.0
      )
    )
    SELECT e.c_nationkey AS cntry, count(*) AS numcust,
           CAST(SUM(CAST(e.c_acctbal AS DECIMAL(27,4))) AS DOUBLE) AS totacctbal
    FROM eligible e
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = e.c_custkey
        AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
    GROUP BY e.c_nationkey
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (nationkey stands in for the phone country code the
    fixture lacks): above-average-balance customers with no orders.
    Scalar average (exact decimal sum / count) + anti join against
    recent orders (the unfiltered variant is vacuous on the fixture —
    every above-average customer has *some* order)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(27,4)")).cast("double")
            / F.count(F.lit(1))
        ).alias("ab")
    )
    eligible = c.crossJoin(F.broadcast(avg_bal)).where(F.col("c_acctbal") > F.col("ab"))
    no_orders = eligible.join(o, eligible.c_custkey == o.o_custkey, "left_anti")
    return no_orders.groupBy(F.col("c_nationkey").alias("cntry")).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(F.col("c_acctbal").cast("decimal(27,4)")).cast("double").alias("totacctbal"),
    )
