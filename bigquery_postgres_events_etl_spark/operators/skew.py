"""Skew mitigation: salted two-stage aggregation.

At 100 TB a hot key (one user generating 1% of all events) turns a
groupBy into a straggler task. Salting splits each key into
``num_salts`` synthetic sub-keys for the first (heavy) aggregation,
then combines the partials in a second (tiny) aggregation — the
shuffle for stage 1 spreads the hot key across ``num_salts`` tasks.

AQE's skew-join splitting handles *join* skew automatically
(spark.sql.adaptive.skewJoin, on in session.py); salting is the
aggregation-side counterpart, and the technique generalizes to joins
against a salt-replicated dim when AQE isn't available.

Correctness is oracle-provable: the salted plan must produce exactly
the plain GROUP BY's answer (queries_skew.salted_aggregation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_group_count_sum(
    df: DataFrame,
    key: str | Column,
    sum_col: str,
    num_salts: int = 16,
    key_alias: str | None = None,
) -> DataFrame:
    """GROUP BY ``key`` computing count + exact-decimal sum, executed
    as salt-split partials → combine. Decomposable aggregates only
    (count/sum/min/max — avg as sum/count downstream).

    The salt is deterministic (pmod of a hash of the row id is fine;
    here spark_partition_id ^ monotonically id would be
    non-reproducible, so we salt on a stable column hash).
    """
    key_col = F.col(key) if isinstance(key, str) else key
    key_alias = key_alias or (key if isinstance(key, str) else "key")
    salt = F.pmod(F.xxhash64(F.col(sum_col)), F.lit(num_salts)).alias("__salt")
    partial = (
        df.select(key_col.alias(key_alias), F.col(sum_col), salt)
        .groupBy(key_alias, "__salt")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col(sum_col).cast("decimal(27,4)")).alias("__s"),
        )
    )
    return partial.groupBy(key_alias).agg(
        F.sum("__n").alias("n_rows"),
        F.sum("__s").cast("double").alias("sum_value"),
    )
