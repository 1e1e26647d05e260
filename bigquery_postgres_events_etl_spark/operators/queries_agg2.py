"""Second aggregation batch: conditional aggregates, boolean
aggregates, ordered string aggregation, union-by-name."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


@register(
    "conditional_aggregates",
    """
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           count(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) FILTER (WHERE o_orderstatus = 'O')
                AS DOUBLE) AS open_revenue,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_totalprice > 450000.0) AS any_huge
    FROM orders GROUP BY o_orderpriority
    """,
)
def conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_if / filtered sums / every / any — one-pass conditional
    aggregation (the FILTER clause compiles to the same conditional
    partial aggregate in both engines)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        F.count_if(F.col("o_totalprice") > 200000.0).alias("n_big"),
        F.sum(
            F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice")).cast(
                "decimal(27,4)"
            )
        )
        .cast("double")
        .alias("open_revenue"),
        F.every(F.col("o_totalprice") > 0).alias("all_positive"),
        F.some(F.col("o_totalprice") > 450000.0).alias("any_huge"),
    )


@register(
    "string_aggregation",
    """
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
           count(*) AS n_nations
    FROM nation GROUP BY n_regionkey
    """,
)
def string_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — expressed as
    sort_array(collect_list) + array_join for a deterministic
    concatenation order (LISTAGG ... WITHIN GROUP equivalent)."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations_csv"),
        F.count(F.lit(1)).alias("n_nations"),
    )


@register(
    "set_union_by_name",
    """
    SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS kind
    FROM customer WHERE c_acctbal > 9900.0
    UNION ALL BY NAME
    SELECT 'supplier' AS kind, s_acctbal AS acctbal, s_name AS name
    FROM supplier WHERE s_acctbal > 9000.0
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName — column-name-resolved union (position-independent;
    the two branches deliberately order columns differently)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    top_c = c.where(F.col("c_acctbal") > 9900.0).select(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("kind"),
    )
    top_s = s.where(F.col("s_acctbal") > 9000.0).select(
        F.lit("supplier").alias("kind"),
        F.col("s_acctbal").alias("acctbal"),
        F.col("s_name").alias("name"),
    )
    return top_c.unionByName(top_s)
