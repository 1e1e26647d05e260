"""Differential test of the BigQuery pushdown-SQL builder (SURVEY §4,
reference extract_bq.py:86-117) without a BigQuery backend.

Strategy: the builder's BigQuery dialect is checked textually against
the reference's construction; its semantics (shard-range inclusivity,
null-user handling, IN-list) are checked by running the DuckDB
stand-in twin on the fixture parquet and comparing row sets against
the declarative Spark operators that production plans use.
"""

from __future__ import annotations

import duckdb
import pytest

from bigquery_postgres_events_etl_spark.io import load_table
from bigquery_postgres_events_etl_spark.operators.etl import (
    date_range_filter,
    tracked_events_filter,
    valid_user_filter,
)
from bigquery_postgres_events_etl_spark.sources.connectors import (
    BigQueryEventsSource,
    duckdb_standin_sql,
)


def test_pushdown_sql_reference_shape():
    src = BigQueryEventsSource("proj", "analytics_1")
    sql = src.build_pushdown_sql("2024-01-05", "2024-01-10", ["purchase", "view"])
    assert "FROM `proj.analytics_1.events_*`" in sql
    assert "_TABLE_SUFFIX BETWEEN '20240105' AND '20240110'" in sql
    assert "user_id IS NOT NULL" in sql
    assert "user_id != ''" in sql
    assert "event_name IN ('purchase', 'view')" in sql
    assert sql.strip().endswith("ORDER BY event_timestamp DESC")
    # no event filter clause when no events given (reference parity)
    assert "IN (" not in src.build_pushdown_sql("2024-01-05", "2024-01-10")


@pytest.mark.parametrize(
    "date_from,date_to,events",
    [
        ("2024-01-05", "2024-01-10", None),
        ("2024-01-05", "2024-01-10", ["purchase", "view"]),
        ("2024-01-07", "2024-01-07", ["click"]),  # single-day range
    ],
)
def test_pushdown_semantics_match_operators(spark, sf_dir, date_from, date_to, events):
    """The stand-in dialect (same WHERE construction) returns exactly
    the rows the Spark operator composition returns — proving range
    endpoints are inclusive on both sides, the null-user arm matches
    valid_user_filter, and the IN list matches tracked_events_filter."""
    from pyspark.sql import functions as F

    df = valid_user_filter(load_table(spark, sf_dir, "events"))
    if events is not None:
        df = tracked_events_filter(df, events)
    df = date_range_filter(df, date_from, date_to)
    spark_rows = {
        tuple(r)
        for r in df.select(
            "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    oracle_rows = set(
        map(tuple, con.execute(duckdb_standin_sql(date_from, date_to, events)).fetchall())
    )
    assert spark_rows == oracle_rows
    assert len(spark_rows) > 0


def test_bigquery_escape_is_backslash_style():
    """GoogleSQL escapes quotes with backslashes, not '' doubling — a
    quote-bearing event name must produce \\' in the BigQuery SQL (''
    would terminate the literal and allow breakout/injection) while the
    DuckDB twin keeps the ''-doubling its dialect requires."""
    from bigquery_postgres_events_etl_spark.sources.connectors import (
        BigQueryEventsSource,
        duckdb_standin_sql,
    )

    src = BigQueryEventsSource(project="p", dataset="d")
    bq = src.build_pushdown_sql(
        "2024-01-01", "2024-01-02", events=["o'brien", "back\\slash"]
    )
    assert "o\\'brien" in bq
    assert "o''brien" not in bq  # '' doubling is not GoogleSQL
    assert "back\\\\slash" in bq

    dk = duckdb_standin_sql("2024-01-01", "2024-01-02", events=["o'brien"])
    assert "o''brien" in dk  # DuckDB dialect keeps '' doubling
