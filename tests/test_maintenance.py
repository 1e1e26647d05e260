"""Small-file compaction: file count drops, contents are identical,
appends keep working afterward."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigquery_postgres_events_etl_spark.io import load_table
from bigquery_postgres_events_etl_spark.operators.etl import flagship_pipeline
from bigquery_postgres_events_etl_spark.sources.maintenance import (
    compact_parquet,
    parquet_file_count,
)
from bigquery_postgres_events_etl_spark.sources.sinks import (
    idempotent_append_parquet,
)


def test_compaction_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    target = str(tmp_path / "t")
    batch = flagship_pipeline(load_table(spark, sf_dir, "events"))
    # simulate many micro-batch appends → many small files
    for i in range(5):
        idempotent_append_parquet(
            spark, batch.where(F.col("event_timestamp") % 5 == i), target
        )
    before_files = parquet_file_count(target)
    before = {tuple(r) for r in spark.read.parquet(target).collect()}
    assert before_files >= 5

    stats = compact_parquet(spark, target, target_file_bytes=1 << 30)
    assert stats["files_before"] == before_files
    assert stats["files_after"] < before_files
    assert stats["rows"] == len(before)

    after = {tuple(r) for r in spark.read.parquet(target).collect()}
    assert after == before  # byte-for-byte same logical contents

    # the sink still appends idempotently on the compacted target
    n = idempotent_append_parquet(spark, batch, target)
    assert n == 0


def test_interrupted_compaction_recovers(spark, sf_dir, tmp_path):
    """Crash between the two swap renames: target missing, data in
    .old — the recovery path must restore it before the next
    compaction/append proceeds (otherwise the appender would treat a
    corrupted state as first load)."""
    import os

    from bigquery_postgres_events_etl_spark.sources.maintenance import (
        recover_interrupted_compaction,
    )

    target = str(tmp_path / "t")
    batch = flagship_pipeline(load_table(spark, sf_dir, "events"))
    idempotent_append_parquet(spark, batch, target)
    before = {tuple(r) for r in spark.read.parquet(target).collect()}

    # simulate the crash window: first rename done, second never ran
    os.rename(target, f"{target}.old.deadbeef")
    assert recover_interrupted_compaction(target)
    assert {tuple(r) for r in spark.read.parquet(target).collect()} == before
    # idempotence intact after recovery
    assert idempotent_append_parquet(spark, batch, target) == 0
