"""Accuracy contracts for approximate aggregates (the rows-only
sketch entry) and decomposition invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigquery_postgres_events_etl_spark.io import load_table
from bigquery_postgres_events_etl_spark.registry import all_queries


def test_approx_count_distinct_accuracy(spark, sf_dir):
    """HLL++ default rsd is 5%; assert within 10% of exact."""
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select("l_orderkey").distinct().count()
    approx = all_queries()["approx_aggregates"](spark, sf_dir).first()["approx_orders"]
    assert abs(approx - exact) / exact < 0.10


def test_percentile_approx_brackets(spark, sf_dir):
    row = all_queries()["approx_aggregates"](spark, sf_dir).first()
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    ).first()
    assert stats.lo <= row.approx_median_price <= row.approx_p99_price <= stats.hi


def test_salted_equals_plain_groupby(spark, sf_dir):
    """Salting must be answer-preserving (also oracle-checked; this
    pins it against the in-engine plain plan too)."""
    from bigquery_postgres_events_etl_spark.operators.skew import (
        salted_group_count_sum,
    )

    e = load_table(spark, sf_dir, "events")
    salted = salted_group_count_sum(e, "user_id", "value", num_salts=8)
    plain = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").cast("decimal(27,4)")).cast("double").alias("sum_value"),
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
