"""TPC-H queries over a deterministically SYNTHESIZED partsupp.

The driver fixtures ship no partsupp table, which blocked Q2/Q9/Q11/
Q16/Q20 — the only TPC-H shapes exercising a bridge table with
correlated aggregates (min-cost supplier, profit by supply cost,
important-stock HAVING against a scalar subquery, distinct-supplier
counts with a NOT IN prune, and an availability-vs-shipped correlated
threshold). Rather than a local parquet the driver's oracle can't see,
partsupp is DERIVED inside each query from part × supplier with
dbgen's supplier-assignment shape (4 suppliers per part at stride
S/4), simplified to ``suppkey = (partkey + partkey/S + i*(S DIV 4))
mod S`` over the observed 0-based key space: dbgen's exact step
``S/4 + (partkey-1)/S`` collides for fixture-scale S (at S=10 the
step walks through multiples of 5 and i=0..3 lands on 2 suppliers),
so the per-part-block rotation moves into the BASE and the stride is
fixed — 4 DISTINCT suppliers guaranteed for any S ≥ 4
(pytest-pinned), deterministic integer availqty/supplycost —
IDENTICAL integer arithmetic on both engines, so the full
hash-oracle gate applies.

Scale shape: partsupp is 4×|part| rows built by a crossJoin with a
4-row spine and a broadcast 1-row dims frame — linear in the part
dimension, no shuffle to construct. At 100 TB the real partsupp would
be a stored table; everything downstream of the CTE is the plan that
would run against it.

Reference: the queries follow the official TPC-H spec shapes (Q2, Q9,
Q11, Q16, Q20), with output columns restricted to those the fixture
part/supplier tables carry (no p_mfgr/s_address/s_comment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

# Shared oracle CTE: the synthesized partsupp. All-integer arithmetic;
# ps_supplycost is cents × 0.01 in exact decimals (DECIMAL(14,0) ×
# DECIMAL(3,2) — exact on both engines; compared outputs always cast
# the final decimal to DOUBLE so engine scale-inference differences
# never reach the schema compare).
_PS_CTE = """
    dims AS (
      SELECT CAST(count(*) AS BIGINT) AS s_cnt,
             CAST(min(s_suppkey) AS BIGINT) AS s_min
      FROM supplier
    ),
    quad AS (SELECT unnest(generate_series(0, 3)) AS i),
    ps0 AS (
      SELECT p_partkey AS ps_partkey,
             s_min + ((p_partkey + (p_partkey // s_cnt) + i * (s_cnt // 4)) % s_cnt)
               AS ps_suppkey
      FROM part CROSS JOIN dims CROSS JOIN quad
    ),
    partsupp AS (
      SELECT ps_partkey, ps_suppkey,
             ((ps_partkey * 17 + ps_suppkey * 31) % 9999) + 1 AS ps_availqty,
             CAST(((ps_partkey * 13 + ps_suppkey * 7) % 100000) + 100 AS DECIMAL(14,0))
               * CAST(0.01 AS DECIMAL(3,2)) AS ps_supplycost
      FROM ps0
    )
"""


def synth_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of the oracle's partsupp CTE: 4 deterministic
    suppliers per part (dbgen's assignment formula over the observed
    supplier-key space), integer availqty, exact-decimal supplycost.
    Construction is crossJoin with a 4-row spine + a broadcast 1-row
    dims frame — map-side, no shuffle."""
    p = load_table(spark, sf_dir, "part").select("p_partkey")
    s = load_table(spark, sf_dir, "supplier")
    dims = s.agg(
        F.count(F.lit(1)).alias("s_cnt"),
        F.min("s_suppkey").cast("long").alias("s_min"),
    )
    quad = spark.range(4).select(F.col("id").alias("i"))
    sk = F.col("s_min") + F.pmod(
        F.col("p_partkey")
        + F.expr("p_partkey DIV s_cnt")
        + F.col("i") * F.expr("s_cnt DIV 4"),
        F.col("s_cnt"),
    )
    ps0 = (
        p.crossJoin(F.broadcast(quad))
        .crossJoin(F.broadcast(dims))
        .select(F.col("p_partkey").alias("ps_partkey"), sk.alias("ps_suppkey"))
    )
    cents = F.pmod(
        F.col("ps_partkey") * 13 + F.col("ps_suppkey") * 7, F.lit(100000)
    ) + F.lit(100)
    return ps0.select(
        "ps_partkey",
        "ps_suppkey",
        (
            F.pmod(
                F.col("ps_partkey") * 17 + F.col("ps_suppkey") * 31,
                F.lit(9999),
            )
            + F.lit(1)
        ).alias("ps_availqty"),
        (cents.cast("decimal(14,0)") * F.lit("0.01").cast("decimal(3,2)")).alias(
            "ps_supplycost"
        ),
    )


@register(
    "q2_min_cost_supplier",
    f"""
    WITH {_PS_CTE},
    europe AS (
      SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_supplycost,
             s.s_acctbal, s.s_name, n.n_name
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    minc AS (
      SELECT ps_partkey, min(ps_supplycost) AS min_cost FROM europe GROUP BY 1
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_brand,
           CAST(e.ps_supplycost AS DOUBLE) AS supplycost
    FROM europe e
    JOIN minc m ON m.ps_partkey = e.ps_partkey AND e.ps_supplycost = m.min_cost
    JOIN part p ON p.p_partkey = e.ps_partkey
    WHERE p.p_size IN (15, 25, 35) AND p.p_type LIKE '%DARD'
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: the minimum-cost supplier per qualifying part within
    a region — the correlated-MIN-over-a-bridge-table shape. Decorrelated
    the standard way: the region-filtered partsupp aggregates to a
    per-part min, which joins back on (part, cost) equality (exact
    decimal — no double min). nation/region broadcast (bounded dims);
    the partsupp↔supplier join is unhinted for AQE. Min ties keep ALL
    achieving suppliers (TPC-H semantics)."""
    ps = synth_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_size").isin(15, 25, 35) & F.col("p_type").like("%DARD")
    )
    europe = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("ps_partkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    minc = europe.groupBy(
        F.col("ps_partkey").alias("m_partkey")
    ).agg(F.min("ps_supplycost").alias("min_cost"))
    return (
        europe.join(
            minc,
            (F.col("ps_partkey") == F.col("m_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .drop("m_partkey")
        .join(p, F.col("ps_partkey") == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("ps_supplycost").cast("double").alias("supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "q9_product_type_profit",
    f"""
    WITH {_PS_CTE}
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                  - ps.ps_supplycost * CAST(l.l_quantity AS DECIMAL(12,2))
                  AS DECIMAL(27,4)) AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN partsupp ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: nation/year profit net of supply cost for a product
    line — the classic 6-table snowflake through the bridge table.
    Profit folds in exact DECIMAL(27,4) (revenue at scale 4, cost ×
    quantity at scale 4 — no double drift), one cast at the end.
    The lineitem↔partsupp join is on the compound (partkey, suppkey)
    key; nation broadcast, the rest AQE.

    NOTE: the fixture's lineitem l_suppkey is uniform over suppliers
    and the synthesized partsupp covers only dbgen's 4-per-part
    assignment, so the bridge join keeps the ~4/|S| slice of lineitem
    whose supplier matches the assignment — the spec's join shape and
    selectivity discipline, applied to what the fixture provides."""
    ps = synth_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    one = F.lit("1.00").cast("decimal(3,2)")
    amount = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (one - F.col("l_discount").cast("decimal(4,2)"))
        - F.col("ps_supplycost") * F.col("l_quantity").cast("decimal(12,2)")
    ).cast("decimal(27,4)")
    j = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
    )


@register(
    "q11_important_stock",
    f"""
    WITH {_PS_CTE},
    natps AS (
      SELECT ps.ps_partkey,
             ps.ps_supplycost * CAST(ps.ps_availqty AS DECIMAL(12,0)) AS v
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_2'
    ),
    tot AS (SELECT SUM(v) AS total_v FROM natps)
    SELECT ps_partkey, CAST(SUM(v) AS DOUBLE) AS stock_value
    FROM natps CROSS JOIN tot
    GROUP BY ps_partkey, total_v
    HAVING SUM(v) > total_v * CAST(0.01 AS DECIMAL(3,2))
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose stock value in one nation exceeds a
    fraction of the national total — group-agg HAVING against a
    scalar subquery. Stock values are exact decimals end-to-end; the
    threshold compare is decimal × exact decimal literal (never
    double-vs-double; registry boundary-safety rule). The 1-row total
    broadcasts back over the per-part aggregate."""
    ps = synth_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_2"
    )
    natps = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            (
                F.col("ps_supplycost")
                * F.col("ps_availqty").cast("decimal(12,0)")
            ).alias("v"),
        )
    )
    tot = natps.agg(F.sum("v").alias("total_v"))
    per_part = natps.groupBy("ps_partkey").agg(F.sum("v").alias("part_v"))
    return (
        per_part.crossJoin(F.broadcast(tot))
        .where(
            F.col("part_v")
            > F.col("total_v") * F.lit("0.01").cast("decimal(3,2)")
        )
        .select(
            "ps_partkey", F.col("part_v").cast("double").alias("stock_value")
        )
    )


@register(
    "q16_parts_supplier_counts",
    f"""
    WITH {_PS_CTE}
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'SM%'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps.ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 100
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: how many distinct suppliers can source each
    (brand, type, size) bucket, excluding flagged suppliers — the
    distinct-count-through-a-bridge + NOT IN anti-join shape. The
    spec's 'complaints in s_comment' exclusion maps to the fixture's
    s_acctbal < 100 (the column the fixture actually carries); the
    anti-join side is supplier-sized (broadcastable), the distinct
    count shuffles once on the group key."""
    ps = synth_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("SM%")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 100
    ).select("s_suppkey")
    return (
        ps.join(bad, ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("ps_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_potential_promotion",
    f"""
    WITH {_PS_CTE},
    shipped AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY 1, 2
    ),
    excess AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM partsupp ps
      JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                     AND sh.l_suppkey = ps.ps_suppkey
      WHERE ps.ps_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
            )
        AND CAST(ps.ps_availqty AS DOUBLE) > 0.5 * sh.qty
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN excess e ON e.ps_suppkey = s.s_suppkey
    WHERE n.n_name = 'NATION_1'
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers in one nation holding more than half a
    year's shipped quantity of a promoted product line — the
    correlated availability-vs-shipped threshold. Decorrelated into a
    per-(part, supplier) shipped aggregate joined back on the bridge
    key (inner join = the spec's NULL-subquery-excludes semantics).
    l_quantity is integer-valued, so the 0.5×sum compare is exact in
    doubles on both engines; the part filter semi-joins before the
    bridge join."""
    ps = synth_partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    promoted = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    excess = (
        ps.join(promoted, ps.ps_partkey == F.col("p_partkey"), "semi")
        .join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey)
            & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .where(F.col("ps_availqty").cast("double") > F.lit(0.5) * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_1"
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(excess, F.col("s_suppkey") == F.col("ps_suppkey"), "semi")
        .select("s_suppkey", "s_name")
    )
