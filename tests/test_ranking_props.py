"""Property tests for the two-pass ranking building blocks: the
integer ntile derivation must match SQL NTILE semantics exactly for
every (n, k), including n < k (every row its own bucket — the branch
where the small-bucket divisor is zero and only lazy CASE evaluation
under ANSI mode keeps the expression total)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigquery_postgres_events_etl_spark.operators.ranking import ntile_from_rn


def _expected_ntile(rn: int, n: int, k: int) -> int:
    base, extra = divmod(n, k)
    big = extra * (base + 1)
    if rn <= big:
        return -(-rn // (base + 1))
    return extra + -(-(rn - big) // base)


def test_ntile_from_rn_matches_sql_ntile_semantics(spark):
    """Exhaustive over n in 1..60 × k in {1,2,3,4,5,7,16,64}: one
    Spark job per k evaluating every (n, rn) pair at once."""
    rows = [(n, rn) for n in range(1, 61) for rn in range(1, n + 1)]
    df = spark.createDataFrame(rows, "n_total long, rn long")
    for k in (1, 2, 3, 4, 5, 7, 16, 64):
        got = {
            (r.n_total, r.rn): r.tile
            for r in df.withColumn(
                "tile", ntile_from_rn(F.col("rn"), F.col("n_total"), k)
            ).collect()
        }
        for n, rn in rows:
            assert got[(n, rn)] == _expected_ntile(rn, n, k), (n, rn, k)


def test_ntile_from_rn_agrees_with_spark_ntile(spark):
    """Differential check against Spark's own NTILE on one global
    window (the thing the two-pass plan replaces), n=137, k=4."""
    from pyspark.sql import Window

    df = spark.range(1, 138).select(F.col("id").alias("rn"))
    w = Window.orderBy("rn")
    native = df.select(
        "rn", F.ntile(4).over(w).cast("long").alias("native_tile")
    )
    derived = native.withColumn(
        "derived_tile", ntile_from_rn(F.col("rn"), F.lit(137).cast("long"), 4)
    )
    mismatches = derived.where(F.col("native_tile") != F.col("derived_tile")).count()
    assert mismatches == 0


def test_global_running_max_matches_single_partition_reference(spark):
    """with_global_running_max (r10): the exclusive running max over a
    range-partitioned frame must equal the single-window definition on
    any input, including duplicate values at partition boundaries."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bigquery_postgres_events_etl_spark.operators.ranking import (
        with_global_running_max,
    )

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 40)) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r.k: r.run_max
        for r in with_global_running_max(
            df, [("k", "asc")], "v", num_partitions=7
        ).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r.k: r.ref
        for r in df.withColumn("ref", F.max("v").over(w)).collect()
    }
    assert got == want
