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


def test_appender_self_heals_interrupted_compaction(spark, sf_dir, tmp_path):
    """The appender itself must repair the crash window: with the
    target stranded in .old, a replayed batch must insert 0 (history
    restored, anti-join sees it) — NOT silently re-create the target
    as a first load and double-insert."""
    import os

    target = str(tmp_path / "t")
    batch = flagship_pipeline(load_table(spark, sf_dir, "events"))
    n_first = idempotent_append_parquet(spark, batch, target)
    assert n_first > 0
    cols = sorted(spark.read.parquet(target).columns)
    before = {tuple(r) for r in spark.read.parquet(target).select(*cols).collect()}

    os.rename(target, f"{target}.old.deadbeef")  # crash window
    # replay of the same batch: appender restores, then dedups to 0
    assert idempotent_append_parquet(spark, batch, target) == 0
    after = {tuple(r) for r in spark.read.parquet(target).select(*cols).collect()}
    assert after == before


def test_recovery_prefers_newest_orphan_and_cleans_losers(spark, sf_dir, tmp_path):
    """With multiple orphans the monotonic-nanos suffix (not uuid
    lexicographics) picks the newest snapshot; the losing orphans are
    removed so they can't be resurrected by a later recovery."""
    import os

    from bigquery_postgres_events_etl_spark.sources.maintenance import (
        recover_interrupted_compaction,
    )

    target = str(tmp_path / "t")
    old_batch = flagship_pipeline(load_table(spark, sf_dir, "events")).limit(10)
    new_batch = flagship_pipeline(load_table(spark, sf_dir, "events"))
    expected = {tuple(r) for r in new_batch.collect()}

    # stale snapshot: legacy hex-only suffix that sorts lexically LAST
    old_batch.write.parquet(f"{target}.old.ffffffff")
    # newer snapshot: timestamped suffix with a lexically-small tail
    new_batch.write.parquet(f"{target}.old.1000000000000000000.0aaa")

    assert recover_interrupted_compaction(target)
    assert {tuple(r) for r in spark.read.parquet(target).collect()} == expected
    parent = os.path.dirname(target)
    assert not [f for f in os.listdir(parent) if ".old." in f]  # losers gone


def test_crashed_compaction_then_concurrent_append_and_recompaction(
    spark, sf_dir, tmp_path
):
    """The composition the lock + orphan-recovery protocol promises:
    a compaction that crashed inside its swap window (target renamed
    away, rewrite tmp stranded), followed by an APPEND racing a fresh
    COMPACTION. The append's missing-target path must restore the
    orphan before reading history (else the anti-join replays a
    double-insert), the two operations must serialize on TargetLock,
    and the final contents must be exactly history ∪ new-batch."""
    import os
    import threading
    import time as _time
    import uuid

    from bigquery_postgres_events_etl_spark.sources.sinks import TargetLock

    target = str(tmp_path / "t")
    batch = flagship_pipeline(load_table(spark, sf_dir, "events"))
    b1 = batch.where(F.col("event_timestamp") % 3 == 0)
    b2 = batch.where(F.col("event_timestamp") % 3 == 1)
    b3 = batch.where(F.col("event_timestamp") % 3 == 2)
    assert idempotent_append_parquet(spark, b1, target) > 0
    assert idempotent_append_parquet(spark, b2, target) > 0
    history = {tuple(r) for r in spark.read.parquet(target).collect()}

    # crash-inject a compaction mid-swap: first rename done, second
    # never ran, the rewrite tmp dir stranded alongside
    os.rename(target, f"{target}.old.{_time.time_ns()}.{uuid.uuid4().hex[:8]}")
    os.makedirs(f"{target}.compact.deadbeef")

    # the racing append runs in a thread while the main thread holds
    # the lock (standing in for an in-flight compaction): it must NOT
    # complete until the lock is released
    inserted: list[int] = []

    def appender():
        # b3 ∪ b1-again: the b1 half must dedup against the RECOVERED
        # history — if recovery didn't run before the read, these rows
        # double-insert
        inserted.append(
            idempotent_append_parquet(spark, b3.unionByName(b1), target)
        )

    with TargetLock(target):
        t = threading.Thread(target=appender)
        t.start()
        _time.sleep(1.5)
        assert not inserted, "append must serialize behind the held lock"
    t.join(timeout=120)
    assert not t.is_alive()

    n_b3 = b3.count()
    assert inserted == [n_b3], "recovered history must dedup the replayed b1"
    after_append = {tuple(r) for r in spark.read.parquet(target).collect()}
    assert after_append == history | {tuple(r) for r in b3.collect()}

    # a fresh compaction over the recovered+appended target (stale
    # .compact tmp still lying around) — contents unchanged, orphans gone
    stats = compact_parquet(spark, target, target_file_bytes=1 << 30)
    assert stats["rows"] == len(after_append)
    final = {tuple(r) for r in spark.read.parquet(target).collect()}
    assert final == after_append
    parent = os.path.dirname(target)
    assert not [
        f for f in os.listdir(parent) if f.startswith("t.old.")
    ], "no orphan snapshots may survive a successful locked cycle"
