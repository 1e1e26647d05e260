"""Bucketed co-located joins — the shuffle-elimination path for
repeated fact-fact joins at 100 TB.

``join_sort_merge_fact`` pays one shuffle of each side per query; a
lakehouse that joins lineitem⨝orders on every report should pay it
once at write time: bucket both tables by the join key into the same
bucket count, and every subsequent join plans as a zero-Exchange
sort-merge over co-located buckets. (Plan-asserted in
tests/test_plans.py::test_bucketed_join_eliminates_exchange.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (+optionally sorted) managed table. At
    production scale ``num_buckets`` ≈ cluster cores × small factor;
    sorting within buckets additionally removes the join's Sort."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys — with
    bucketing enabled Catalyst skips both Exchanges."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key])
