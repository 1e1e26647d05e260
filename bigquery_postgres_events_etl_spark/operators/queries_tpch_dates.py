"""TPC-H Q4/Q12/Q19/Q21 over deterministically SYNTHESIZED shipping
columns — the last four fixture-blocked TPC-H shapes.

The driver's lineitem carries no l_commitdate / l_receiptdate /
l_shipmode / l_shipinstruct and part no p_container, which blocked
the only TPC-H queries exercising EXISTS-per-order semi-joins over
date comparisons (Q4), the commit-vs-receipt lateness classification
(Q12), the disjunctive multi-attribute predicate push (Q19), and the
EXISTS ∧ NOT-EXISTS multi-supplier wait analysis (Q21). Following the
round-6 partsupp precedent (queries_tpch_ps.py — judged sound because
the synthesis is a deterministic pure function of keys, identical on
both engines, and at real scale the stored column replaces the
synthesis subtree), the missing columns derive in-query from
(l_orderkey, l_linenumber) / p_partkey by integer modular arithmetic:

- l_commitdate = shipdate + ((7·ok + 11·ln) mod 61) − 30 days — so
  commit may fall up to 30 days either side of shipment, giving both
  late (ship after commit) and on-time populations;
- l_receiptdate = shipdate + 1 + ((13·ok + 5·ln) mod 30) days —
  receipt strictly after shipment;
- l_shipmode / l_shipinstruct / p_container = key-indexed picks from
  the spec's literal domains (multipliers COPRIME with the domain
  size so every value appears — the first container multiplier, 3,
  shared a factor with 12 and silently covered only 4 of 12
  containers; caught by the domain property test).

All arithmetic is BIGINT mod + DATE ± INTEGER — bit-identical across
engines, so the full hash-oracle gate applies. The reference for
query shapes is the official TPC-H spec, with output columns
restricted to what the fixture tables carry.

Scale shape: the synthesis is map-side expressions inside the
lineitem/part scan (zero extra shuffles); every plan below is the one
that would run against stored columns at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

_MODES = ("MAIL", "SHIP", "AIR", "RAIL", "TRUCK", "FOB", "REG AIR")
_INSTRUCTS = ("DELIVER IN PERSON", "COLLECT COD", "NONE", "TAKE BACK RETURN")
_CONTAINERS = (
    "SM CASE", "SM BOX", "SM PACK", "SM PKG",
    "MED BAG", "MED BOX", "MED PKG", "MED PACK",
    "LG CASE", "LG BOX", "LG PACK", "LG PKG",
)

_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
_REV_SUM = f"CAST(SUM(CAST({_REV} AS DECIMAL(27,4))) AS DOUBLE)"


def _sql_list(vals: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{v}'" for v in vals) + "]"


# Shared oracle CTE: lineitem extended with the synthesized shipping
# columns (DuckDB list indexing is 1-based; Spark element_at matches).
_LX_CTE = f"""
    lineitem_x AS (
      SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
             l_extendedprice, l_discount, l_shipdate,
             CAST(l_shipdate AS DATE)
               + CAST(((l_orderkey * 7 + l_linenumber * 11) % 61) - 30 AS INTEGER)
               AS l_commitdate,
             CAST(l_shipdate AS DATE)
               + CAST(1 + ((l_orderkey * 13 + l_linenumber * 5) % 30) AS INTEGER)
               AS l_receiptdate,
             ({_sql_list(_MODES)})[1 + CAST((l_orderkey * 3 + l_linenumber) % 7 AS INTEGER)]
               AS l_shipmode,
             ({_sql_list(_INSTRUCTS)})[1 + CAST((l_orderkey * 5 + l_linenumber * 3) % 4 AS INTEGER)]
               AS l_shipinstruct
      FROM lineitem
    )
"""

_PX_CTE = f"""
    part_x AS (
      SELECT p_partkey, p_brand, p_size,
             ({_sql_list(_CONTAINERS)})[1 + CAST((p_partkey * 7) % 12 AS INTEGER)]
               AS p_container
      FROM part
    )
"""


def synth_lineitem_x(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the oracle's lineitem_x CTE — map-side
    expressions in the lineitem scan, zero extra shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber")
    ship_d = F.col("l_shipdate").cast("date")
    modes = F.array(*[F.lit(m) for m in _MODES])
    instr = F.array(*[F.lit(i) for i in _INSTRUCTS])
    return li.select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_shipdate",
        F.date_add(
            ship_d, (F.pmod(ok * 7 + ln * 11, F.lit(61)) - 30).cast("int")
        ).alias("l_commitdate"),
        F.date_add(
            ship_d, (F.pmod(ok * 13 + ln * 5, F.lit(30)) + 1).cast("int")
        ).alias("l_receiptdate"),
        F.element_at(
            modes, (F.pmod(ok * 3 + ln, F.lit(7)) + 1).cast("int")
        ).alias("l_shipmode"),
        F.element_at(
            instr, (F.pmod(ok * 5 + ln * 3, F.lit(4)) + 1).cast("int")
        ).alias("l_shipinstruct"),
    )


def synth_part_x(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    containers = F.array(*[F.lit(c) for c in _CONTAINERS])
    return p.select(
        "p_partkey", "p_brand", "p_size",
        F.element_at(
            containers, (F.pmod(F.col("p_partkey") * 7, F.lit(12)) + 1).cast("int")
        ).alias("p_container"),
    )


@register(
    "q4_order_priority",
    f"""
    WITH {_LX_CTE}
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem_x l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_commitdate < l.l_receiptdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): orders placed in a quarter
    with at least one line received after its committed date, counted
    by priority — the EXISTS-per-order shape, planned as a LEFT SEMI
    join on orderkey (never a fact×fact join). Spec: TPC-H 2.18 §Q4;
    dates synthesized (module docstring)."""
    o = load_table(spark, sf_dir, "orders")
    lx = synth_lineitem_x(spark, sf_dir)
    late = lx.where(F.col("l_commitdate") < F.col("l_receiptdate")).select(
        "l_orderkey"
    )
    return (
        o.where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(late, o.o_orderkey == late.l_orderkey, "semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q12_shipmode_priority",
    f"""
    WITH {_LX_CTE}
    SELECT l.l_shipmode,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem_x l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipmode IN ('MAIL', 'SHIP')
      AND l.l_commitdate < l.l_receiptdate
      AND CAST(l.l_shipdate AS DATE) < l.l_commitdate
      AND l.l_receiptdate >= DATE '1996-01-01'
      AND l.l_receiptdate <  DATE '1997-01-01'
    GROUP BY l.l_shipmode
    ORDER BY l.l_shipmode
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority): lines shipped
    MAIL/SHIP, received in 1996, shipped before commit and committed
    before receipt, split into high/low priority counts — the
    lateness-classification join. Filters sit on the synthesized
    columns map-side BELOW the join, so only qualifying lines reach
    the orderkey shuffle. Spec: TPC-H §Q12."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    lx = synth_lineitem_x(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l = (
        lx.where(F.col("l_shipmode").isin("MAIL", "SHIP"))
        .where(F.col("l_commitdate") < F.col("l_receiptdate"))
        .where(F.col("l_shipdate").cast("date") < F.col("l_commitdate"))
        .where(
            F.col("l_receiptdate").between(
                F.lit("1996-01-01").cast("date"),
                F.lit("1996-12-31").cast("date"),
            )
        )
        .select("l_orderkey", "l_shipmode")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_shipmode")
    )


@register(
    "q19_discounted_revenue",
    f"""
    WITH {_LX_CTE},
    {_PX_CTE}
    SELECT {_REV_SUM} AS revenue
    FROM lineitem_x l JOIN part_x p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipmode IN ('AIR', 'REG AIR')
      AND l.l_shipinstruct = 'DELIVER IN PERSON'
      AND (
        (p.p_brand = 'Brand#12' AND p.p_container IN ('SM CASE','SM BOX','SM PACK','SM PKG')
          AND l.l_quantity >= 1 AND l.l_quantity <= 11 AND p.p_size BETWEEN 1 AND 5)
        OR
        (p.p_brand = 'Brand#23' AND p.p_container IN ('MED BAG','MED BOX','MED PKG','MED PACK')
          AND l.l_quantity >= 10 AND l.l_quantity <= 20 AND p.p_size BETWEEN 1 AND 10)
        OR
        (p.p_brand = 'Brand#3' AND p.p_container IN ('LG CASE','LG BOX','LG PACK','LG PKG')
          AND l.l_quantity >= 20 AND l.l_quantity <= 30 AND p.p_size BETWEEN 1 AND 15)
      )
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): one revenue scalar under a
    three-branch disjunction over brand/container/quantity/size with
    conjunctive shipmode/shipinstruct filters — the predicate-pushdown
    stress shape (the conjuncts common to all branches must reach the
    scans; the disjunction evaluates post-join). Revenue folds in
    exact DECIMAL(27,4). Spec: TPC-H §Q19 (Brand#3 instead of
    Brand#34 — the fixture's brand domain is Brand#1..25)."""
    lx = synth_lineitem_x(spark, sf_dir)
    px = synth_part_x(spark, sf_dir)
    l = lx.where(
        F.col("l_shipmode").isin("AIR", "REG AIR")
        & (F.col("l_shipinstruct") == "DELIVER IN PERSON")
    )
    q = F.col("l_quantity")
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_container").isin("SM CASE", "SM BOX", "SM PACK", "SM PKG")
            & (q >= 1) & (q <= 11) & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_container").isin("MED BAG", "MED BOX", "MED PKG", "MED PACK")
            & (q >= 10) & (q <= 20) & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_container").isin("LG CASE", "LG BOX", "LG PACK", "LG PKG")
            & (q >= 20) & (q <= 30) & F.col("p_size").between(1, 15)
        )
    )
    one = F.lit("1.00").cast("decimal(3,2)")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        one - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        l.join(px, l.l_partkey == px.p_partkey)
        .where(branch)
        .agg(F.sum(rev.cast("decimal(27,4)")).cast("double").alias("revenue"))
    )


@register(
    "q21_suppliers_kept_waiting",
    f"""
    WITH {_LX_CTE}
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem_x l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_receiptdate > l1.l_commitdate
      AND n.n_name = 'NATION_3'
      AND EXISTS (
        SELECT 1 FROM lineitem_x l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey != l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem_x l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey != l1.l_suppkey
          AND l3.l_receiptdate > l3.l_commitdate
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): for finalized
    multi-supplier orders, the supplier whose line was the ONLY late
    one — EXISTS (another supplier participated) ∧ NOT EXISTS (another
    supplier was late), the hardest correlated-subquery shape in the
    suite. Planned as one semi- and one anti-join on orderkey against
    key slivers of the same synthesized frame; the nation filter
    broadcasts. Spec: TPC-H §Q21 (NATION_3 for the spec's literal
    nation)."""
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    n = load_table(spark, sf_dir, "nation")
    lx = synth_lineitem_x(spark, sf_dir)
    l1 = lx.select(
        "l_orderkey", "l_suppkey",
        (F.col("l_receiptdate") > F.col("l_commitdate")).alias("late"),
    )
    base = (
        l1.where(F.col("late"))
        .join(o.where(F.col("o_orderstatus") == "F"), l1.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_suppkey")
    )
    others = l1.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
        "late",
    )
    has_other = base.join(
        others,
        (base.l_orderkey == others.o2_orderkey)
        & (base.l_suppkey != others.o2_suppkey),
        "semi",
    )
    no_other_late = has_other.join(
        others.where(F.col("late")),
        (has_other.l_orderkey == others.o2_orderkey)
        & (has_other.l_suppkey != others.o2_suppkey),
        "anti",
    )
    nat = n.where(F.col("n_name") == "NATION_3").select("n_nationkey")
    sup = s.join(
        F.broadcast(nat), s.s_nationkey == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    return (
        no_other_late.join(sup, no_other_late.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
