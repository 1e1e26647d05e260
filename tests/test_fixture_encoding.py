"""Fixture timestamp-encoding regression tests.

The driver's fixture writer has flipped the events ``ts`` column
between parquet TIMESTAMP(NANOS)-as-int64 and naive timestamp[us]
across rounds; each flip previously surfaced as several mysterious
event-time test failures. These tests pin the invariant directly: the
batch reader (io.load_table) and the streaming reader
(streaming.stream.read_events_stream) must produce IDENTICAL ``ts``
instants for the same file, under either encoding, and those instants
must live in a plausible epoch range (catching a 1000× compression
into January 1970).
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from bigquery_postgres_events_etl_spark.io import load_table
from bigquery_postgres_events_etl_spark.streaming.stream import read_events_stream

EPOCH_2000_US = 946_684_800 * 1_000_000


def _drain_minmax(spark, src: str, name: str):
    """Drain the streaming reader over ``src`` and return (min, max)
    unix_micros of the normalized ts column."""
    stream = read_events_stream(spark, src).select(
        F.unix_micros("ts").alias("us")
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    row = spark.sql(f"SELECT min(us) AS lo, max(us) AS hi FROM {name}").first()
    return row.lo, row.hi


def test_batch_and_stream_agree_on_current_fixture(spark, sf_dir, tmp_path):
    """Whatever encoding the current fixtures use, batch and streaming
    readers must see the same instants, in a sane epoch range."""
    batch = load_table(spark, sf_dir, "events")
    b = batch.agg(
        F.min(F.unix_micros("ts")).alias("lo"), F.max(F.unix_micros("ts")).alias("hi")
    ).first()

    src = tmp_path / "enc_src"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    lo, hi = _drain_minmax(spark, str(src), "enc_current_out")

    assert (lo, hi) == (b.lo, b.hi)
    assert b.lo > EPOCH_2000_US  # not compressed into 1970


def test_stream_reader_handles_legacy_nanos_fixture(spark, sf_dir, tmp_path):
    """Rewrite the current fixture as TIMESTAMP(NANOS) parquet (the
    pre-r3 driver layout) and assert the streaming reader's footer
    probe picks the nanos branch and lands on the same instants."""
    table = pq.read_table(f"{sf_dir}/events.parquet")
    idx = table.schema.get_field_index("ts")
    ts_type = table.schema.field("ts").type
    if not pa.types.is_timestamp(ts_type):
        # already int64 — cast through us-timestamp first
        table = table.set_column(
            idx, "ts", table.column("ts").cast(pa.timestamp("us"))
        )
    nanos = table.set_column(
        idx, "ts", table.column("ts").cast(pa.timestamp("ns"))
    )
    src = tmp_path / "nanos_src"
    src.mkdir()
    pq.write_table(nanos, src / "events.parquet", store_schema=False)

    batch = load_table(spark, sf_dir, "events")
    b = batch.agg(
        F.min(F.unix_micros("ts")).alias("lo"), F.max(F.unix_micros("ts")).alias("hi")
    ).first()
    lo, hi = _drain_minmax(spark, str(src), "enc_nanos_out")

    assert (lo, hi) == (b.lo, b.hi)
    assert lo > EPOCH_2000_US


def test_stream_reader_rejects_mixed_encoding_dir(spark, sf_dir, tmp_path):
    """A source dir mixing TIMESTAMP(NANOS)/int64 and timestamp[us]
    files (writer flip mid-stream + checkpointed-resume appends) cannot
    be read under one explicit schema — the probe must raise rather
    than silently corrupt the other encoding's event times."""
    import pytest

    from bigquery_postgres_events_etl_spark.streaming.stream import (
        _ts_is_nanos_int64,
        read_events_stream,
    )

    table = pq.read_table(f"{sf_dir}/events.parquet")
    idx = table.schema.get_field_index("ts")
    if not pa.types.is_timestamp(table.schema.field("ts").type):
        table = table.set_column(
            idx, "ts", table.column("ts").cast(pa.timestamp("us"))
        )
    src = tmp_path / "mixed_src"
    src.mkdir()
    pq.write_table(table, src / "part-0.parquet")  # timestamp[us]
    pq.write_table(
        table.set_column(idx, "ts", table.column("ts").cast(pa.timestamp("ns"))),
        src / "part-1.parquet",
        store_schema=False,
    )  # TIMESTAMP(NANOS)

    with pytest.raises(ValueError, match="mixed ts encodings"):
        _ts_is_nanos_int64(str(src))
    with pytest.raises(ValueError, match="mixed ts encodings"):
        read_events_stream(spark, str(src))
