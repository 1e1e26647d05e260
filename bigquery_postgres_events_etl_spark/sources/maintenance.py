"""Lake maintenance: small-file compaction.

Incremental appends (streaming/incremental.py) produce one parquet
file per partition per batch; thousands of micro-batches later the
target is a small-file swamp — listing dominates scan time and each
task reads kilobytes. The reference never hits this (PostgreSQL
compacts via its heap), so a lake-backed rebuild must provide the
maintenance op explicitly.

Rewrite-based compaction: read → coalesce toward a target in-memory
partition size → atomic swap via rename. At 100 TB this runs
per-partition (date=…) so a day compacts independently and the swap
window is one directory; a transactional table format (Delta
OPTIMIZE) subsumes the swap dance.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession

from .sinks import TargetLock


def parquet_file_count(path: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> dict:
    """Compact a parquet directory toward ``target_file_bytes`` files.

    Serialized with the writers via the same ``TargetLock`` the
    idempotent appender takes, so compaction never races an append.
    The rewrite lands in a sibling temp dir and replaces the target
    with two renames — readers see the old or the new listing, never a
    mix. Returns {files_before, files_after, rows}.
    """
    with TargetLock(path):
        df = spark.read.parquet(path)
        rows = df.count()
        total_bytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )
        n_files = max(1, round(total_bytes / target_file_bytes))
        before = parquet_file_count(path)

        tmp = f"{path.rstrip('/')}.compact.{uuid.uuid4().hex[:8]}"
        writer = df.coalesce(n_files).write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)

        old = f"{path.rstrip('/')}.old.{uuid.uuid4().hex[:8]}"
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
        return {
            "files_before": before,
            "files_after": parquet_file_count(path),
            "rows": rows,
        }
