"""The flagship ETL pipeline — Spark-native rebuild of the reference's
extract→transform→dedup→load path (SURVEY §7-M1).

Reference lifecycle (extract_bq.py:86-185 / flask_server.py:142-196):
SQL pushed to BigQuery (projection P1, filters F1-F4, shard pruning S2,
sort O1/O2) → full driver materialization (anti-pattern S3) →
row-at-a-time param extraction (P2) → CSV or batched ON-CONFLICT
Postgres insert (K1-K4).

Spark rebuild: one declarative DataFrame plan. Catalyst pushes the
filters and the 4-column projection into the parquet scan; the dedup is
a single shuffle on the dedup key; nothing ever reaches the driver.
At 100 TB: the scan prunes date partitions (the watermark predicate is
also a partition predicate), the dedup shuffle is the only exchange,
and the survivor-selection window is a partial-aggregatable pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import json_param
from ..schemas import FIXTURE_TRACKED_EVENTS


def valid_user_filter(df: DataFrame, user_col: str = "user_id") -> DataFrame:
    """F1+F2 — reject NULL and empty-string user ids
    (reference: extract_bq.py:111-112).

    The fixture ``user_id`` is numeric, so the ``!= ''`` arm only
    applies to string-typed columns (the reference's contract).
    """
    c = F.col(user_col)
    cond = c.isNotNull()
    if dict(df.dtypes).get(user_col) == "string":
        cond = cond & (c != F.lit(""))
    return df.where(cond)


def tracked_events_filter(df: DataFrame, events: list[str], col: str = "event_type") -> DataFrame:
    """F3 — set-membership filter (reference: extract_bq.py:89-93,113)."""
    return df.where(F.col(col).isin(events))


def watermark_filter(df: DataFrame, watermark_us: int, ts_col: str = "ts") -> DataFrame:
    """F4 — only rows strictly newer than the persisted high-water mark
    (reference: flask_server.py:151). At scale this predicate must also
    prune date partitions — see streaming.incremental.
    """
    return df.where(F.unix_micros(F.col(ts_col)) > F.lit(watermark_us))


def date_range_filter(df: DataFrame, date_from: str, date_to: str, ts_col: str = "ts") -> DataFrame:
    """S2/F5 — inclusive date-range pruning, the Spark-native equivalent
    of `_TABLE_SUFFIX BETWEEN` (reference: extract_bq.py:98-100,110).
    On a date-partitioned lake this is partition pruning, not a scan.
    """
    return df.where(F.to_date(F.col(ts_col)).between(F.lit(date_from), F.lit(date_to)))


def dedup_application_events(
    df: DataFrame,
    keys: list[str],
    order_col: str = "event_id",
    numeric_order: bool = True,
) -> DataFrame:
    """K4 — conflict-skipping dedup with a deterministic survivor.

    The reference's `ON CONFLICT DO NOTHING` keeps the first-arriving
    row (extract_bq.py:216-221); `dropDuplicates` keeps an arbitrary
    one. For oracle-reproducible semantics we keep the row with the
    smallest ``order_col`` via row_number — same single shuffle as
    dropDuplicates, deterministic survivor (SURVEY §7 risk 3).

    ``numeric_order`` pins the tie-break to the NUMERIC id even after
    the projection has cast event_id to its string output shape: ids
    are assigned in arrival order, so numeric-min IS first-arriving —
    while string order ranks "10" before "2". The r14 constant-
    timestamp sweep caught the divergence: the oracle's window bound
    to the source BIGINT while the engine ordered the VARCHAR
    projection, and the two minima coincide only while collision
    groups are small (every driver fixture — the latent-bug shape).
    """
    oc = F.col(order_col)
    if numeric_order:
        oc = oc.cast("long")
    w = Window.partitionBy(*keys).orderBy(oc.asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def flagship_pipeline(
    events: DataFrame,
    tracked: list[str] | None = None,
    watermark_us: int | None = None,
    date_from: str | None = None,
    date_to: str | None = None,
) -> DataFrame:
    """End-to-end rebuild of the reference extract (EP1/EP2):

    scan → F1/F2 valid-user → F3 tracked-events → [F4 watermark |
    S2 date range] → P2 param extraction (JSON variant on fixture
    ``props``) → P1 projection to the ``application_events`` shape →
    K4 deterministic dedup on (user_id, event_timestamp, event_name).

    Output columns mirror the reference CSV header
    (extract_bq.py:149): user_id, event_date, event_timestamp (raw µs
    int64 end-to-end — SURVEY §7 risk 2), event_name, event_id,
    event_name_detail.
    """
    tracked = tracked if tracked is not None else FIXTURE_TRACKED_EVENTS
    df = valid_user_filter(events)
    df = tracked_events_filter(df, tracked)
    if watermark_us is not None:
        df = watermark_filter(df, watermark_us)
    if date_from is not None and date_to is not None:
        df = date_range_filter(df, date_from, date_to)
    df = df.select(
        F.col("user_id"),
        F.to_date("ts").alias("event_date"),
        F.unix_micros("ts").alias("event_timestamp"),
        F.col("event_type").alias("event_name"),
        F.col("event_id").cast("string").alias("event_id"),
        json_param("props", "k").alias("event_name_detail"),
    )
    return dedup_application_events(
        df, ["user_id", "event_timestamp", "event_name"], order_col="event_id"
    )
