"""Production observability + schema-evolution behaviors:

- ``df.observe``: data-quality counters (rows, nulls, bad values)
  collected as job metrics DURING the write — no second pass over
  100 TB to know what was loaded (the reference logs counts by
  re-iterating its driver-side list; at scale that is a free
  Observation instead).
- ``mergeSchema``: an appended batch with a new column must not break
  readers of the combined target (additive evolution — the lake-side
  answer to the reference's fixed DDL).
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from bigquery_postgres_events_etl_spark.io import load_table
from bigquery_postgres_events_etl_spark.operators.etl import flagship_pipeline


def test_observe_emits_quality_metrics_in_one_pass(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    obs = Observation("load_quality")
    out = flagship_pipeline(events).observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("null_users"),
        F.sum((F.col("event_timestamp") <= 0).cast("long")).alias("bad_ts"),
    )
    out.write.mode("overwrite").parquet(str(tmp_path / "t"))
    got = obs.get
    assert got["rows"] == spark.read.parquet(str(tmp_path / "t")).count() > 0
    assert got["null_users"] == 0  # the valid-user filter ran upstream
    assert got["bad_ts"] == 0


def test_merge_schema_additive_evolution(spark, sf_dir, tmp_path):
    target = str(tmp_path / "t")
    v1 = flagship_pipeline(load_table(spark, sf_dir, "events"))
    v1.write.mode("append").parquet(target)
    n1 = v1.count()

    # a later batch gains a column (additive evolution)
    v2 = v1.limit(10).withColumn("ingest_tag", F.lit("r2"))
    v2.write.mode("append").parquet(target)

    merged = spark.read.option("mergeSchema", "true").parquet(target)
    assert "ingest_tag" in merged.columns
    assert merged.count() == n1 + 10
    # old rows read as NULL for the new column; new rows carry it
    assert merged.where(F.col("ingest_tag").isNull()).count() == n1
    assert merged.where(F.col("ingest_tag") == "r2").count() == 10


def test_registry_queries_repair_foreign_session_timezone(spark, sf_dir):
    """The driver builds its own SparkSession and may carry the host's
    timezone; every ts-sensitive query must produce UTC-correct
    results anyway because io._pin_session re-pins the session at
    load time. Drive two event-time queries with the session zone
    deliberately broken and compare against the UTC answer."""
    from bigquery_postgres_events_etl_spark.registry import all_queries

    qs = all_queries()
    names = ["filter_date_range", "tumbling_window_hourly"]
    want = {n: sorted(map(tuple, qs[n](spark, sf_dir).collect())) for n in names}

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        for n in names:
            got = sorted(map(tuple, qs[n](spark, sf_dir).collect()))
            assert got == want[n], f"{n} drifted under a foreign session zone"
        # and the pin actually repaired the session
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
