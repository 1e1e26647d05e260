"""SQL-API queries: subqueries, grouping sets, HAVING.

These run the SAME SQL text through Spark SQL and the DuckDB oracle
(ANSI-compatible subset, fixture views registered under identical
names) — demonstrating the engine's SQL surface and pinning
plan-equivalence between the DataFrame and SQL entry points (Catalyst
produces one plan for both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..registry import register
from ..schemas import FIXTURE_TABLES


def _run_sql(sql: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        for t in FIXTURE_TABLES:
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        return spark.sql(sql)

    return fn


def _register_sql(name: str, sql: str) -> None:
    register(name, sql)(_run_sql(sql))


# Scalar subquery: customers above the (exact-decimal) mean balance.
_register_sql(
    "sql_scalar_subquery",
    """
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,4))) AS DOUBLE) / COUNT(*)
      FROM customer
    )
    """,
)

# IN subquery (decorrelated to a semi-join by Catalyst).
_register_sql(
    "sql_in_subquery",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000.0)
    """,
)

# Correlated EXISTS (decorrelated to a semi-join).
_register_sql(
    "sql_correlated_exists",
    """
    SELECT s_suppkey, s_name FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey
        AND l.l_shipdate > TIMESTAMP '2001-06-01 00:00:00'
    )
    """,
)

# NOT EXISTS (anti-join).
_register_sql(
    "sql_not_exists",
    """
    SELECT p_partkey, p_name FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey
    )
    """,
)

# GROUPING SETS — explicit set list (rollup/cube generalization).
_register_sql(
    "sql_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
           CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
           count(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)

# HAVING over an exact-decimal aggregate.
_register_sql(
    "sql_having",
    """
    SELECT l_suppkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY l_suppkey
    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) > 1000.0
    """,
)

# Derived-table + window mix through the SQL surface.
_register_sql(
    "sql_window_over_derived",
    """
    SELECT c_mktsegment, n_orders,
           CAST(RANK() OVER (ORDER BY n_orders DESC, c_mktsegment) AS BIGINT) AS seg_rank
    FROM (
      SELECT c.c_mktsegment, count(*) AS n_orders
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment
    )
    """,
)


# LATERAL join — correlated derived table with per-outer-row top-N
# (DuckDB and Spark >=3.2 share the syntax and semantics). Spark plans
# this as a rewritten join + window, not a nested loop — the
# scale-correct top-N-per-group strategy falls out of the rewrite.
_register_sql(
    "sql_lateral_topn",
    """
    SELECT r.r_name, l.n_name, l.n_cust
    FROM region r, LATERAL (
      SELECT n.n_name, count(c.c_custkey) AS n_cust
      FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
      WHERE n.n_regionkey = r.r_regionkey
      GROUP BY n.n_name
      ORDER BY n_cust DESC, n.n_name
      LIMIT 2
    ) l
    """,
)
