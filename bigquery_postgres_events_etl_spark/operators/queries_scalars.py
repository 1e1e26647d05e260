"""Scalar-function coverage: math, NULL handling, array functions,
and approximate aggregates.

Rounding note: ``round()`` is deliberately absent from oracle-checked
outputs — Spark rounds decimal-string HALF_UP while DuckDB rounds the
exact binary value, so values sitting on a .5 tie (common in 2-decimal
money) diverge. floor/ceil/sqrt/abs/mod are exactly defined on doubles
and safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


@register(
    "math_functions",
    """
    SELECT c_custkey,
           abs(c_acctbal) AS abs_bal,
           CAST(floor(c_acctbal) AS BIGINT) AS floor_bal,
           CAST(ceil(c_acctbal) AS BIGINT) AS ceil_bal,
           sqrt(abs(c_acctbal)) AS sqrt_bal,
           CAST(c_nationkey % 5 AS INTEGER) AS nation_mod,
           CAST(sign(c_acctbal) AS DOUBLE) AS bal_sign,
           greatest(c_acctbal, 0.0) AS bal_clamped,
           CAST(least(c_nationkey, 10) AS BIGINT) AS nation_capped,
           power(CAST(c_nationkey AS DOUBLE), 2) AS nation_sq
    FROM customer
    """,
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-series math scalars — all IEEE-exact operations (sqrt is
    correctly-rounded by the standard; exp/ln are not and are avoided
    in oracle-checked outputs)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.abs("c_acctbal").alias("abs_bal"),
        F.floor("c_acctbal").alias("floor_bal"),
        F.ceil("c_acctbal").alias("ceil_bal"),
        F.sqrt(F.abs("c_acctbal")).alias("sqrt_bal"),
        (F.col("c_nationkey") % 5).cast("int").alias("nation_mod"),
        F.signum("c_acctbal").alias("bal_sign"),
        F.greatest("c_acctbal", F.lit(0.0)).alias("bal_clamped"),
        F.least("c_nationkey", F.lit(10)).cast("bigint").alias("nation_capped"),
        F.pow(F.col("c_nationkey").cast("double"), 2).alias("nation_sq"),
    )


@register(
    "null_handling",
    """
    SELECT event_id,
           coalesce(json_extract_string(props, '$.missing'), 'default') AS with_default,
           nullif(event_type, 'error') AS type_or_null,
           CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 0 ELSE 1 END AS has_k,
           ifnull(json_extract_string(props, '$.k'), '-1') AS k_or_neg1
    FROM events
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce/nullif/ifnull/IS NULL — the NULL-discipline surface
    the reference handles with Python `.get(..., None)` chains."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    missing = F.get_json_object("props", "$.missing")
    return e.select(
        "event_id",
        F.coalesce(missing, F.lit("default")).alias("with_default"),
        F.nullif("event_type", F.lit("error")).alias("type_or_null"),
        F.when(k.isNull(), 0).otherwise(1).alias("has_k"),
        F.ifnull(k, F.lit("-1")).alias("k_or_neg1"),
    )


@register(
    "array_functions",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           list_contains(toks, 'spark') AS has_spark,
           coalesce(array_to_string(list_sort(list_distinct(toks)), ' '), '') AS vocab,
           coalesce(array_to_string(toks[1:3], ' '), '') AS first3,
           list_reverse_sort(list_distinct(toks))[1] AS max_token
    FROM t
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface: contains/sort/distinct/slice — higher-order
    built-ins over the token arrays (no explode, no shuffle).

    Array-valued outputs are serialized to space-joined strings
    (`concat_ws` / `array_to_string`) so downstream row-oriented
    consumers — and the driver's pandas canonicalizer, which cannot
    hash list cells — see a flat deterministic column.  The array
    semantics under test are unchanged."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.concat_ws(" ", F.sort_array(F.array_distinct(toks))).alias("vocab"),
        F.concat_ws(" ", F.slice(toks, 1, 3)).alias("first3"),
        F.sort_array(F.array_distinct(toks), asc=False).getItem(0).alias("max_token"),
    )


@register("approx_aggregates", None)  # sketches differ across engines by design
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct + approximate quantiles — the sketch
    surface for 100 TB interactive stats (exact twins exist as
    agg_global_stats / countDistinct entries; sketch outputs are
    engine-specific so this is a rows-only check, accuracy asserted in
    tests/test_relational_props.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.percentile_approx("l_extendedprice", 0.99).alias("approx_p99_price"),
    )
