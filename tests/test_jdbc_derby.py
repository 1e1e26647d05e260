"""REAL JDBC execution leg over embedded Apache Derby.

The reference writes PostgreSQL over a live connection; this container
has no PG server or network — but Spark SHIPS a complete embedded SQL
engine with a JDBC driver (Derby, on every executor classpath), so the
actual Spark JDBC code paths can execute for real:

- `df.write.format("jdbc")` — executor-parallel batched inserts;
- `JdbcTableSource.load` — the partition-split parallel read
  (numPartitions real splits, fetchsize, pushdown);
- `write_jdbc_merge_append` — the reference's conflict-skipping
  retention contract (`ON CONFLICT DO NOTHING`,
  extract_bq.py:187-267) as staging + ANSI MERGE, idempotent under
  replay (the exactly-once-effect sink contract).

What stays env-blocked is only the PostgreSQL WIRE target; the JDBC
mechanics themselves are no longer stubbed anywhere.
"""

from __future__ import annotations

import pytest

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/db;create=true"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_jdbc_roundtrip_and_partition_parallel_read(spark, derby_url):
    from bigquery_postgres_events_etl_spark.sources.connectors import (
        JdbcTableSource,
    )

    df = spark.createDataFrame(
        [(i, f"u{i % 3}", float(i) * 1.5) for i in range(1, 21)],
        "id long, name string, v double",
    )
    (
        df.write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "events_t")
        .option("driver", DRIVER)
        .mode("append")
        .save()
    )
    src = JdbcTableSource(
        derby_url, "events_t", partition_column="id", num_partitions=4,
        driver=DRIVER,
    )
    back = src.load(spark, 1, 20)
    assert _rows(back) == _rows(df)
    # the partition split is REAL: four concurrent range queries
    assert back.rdd.getNumPartitions() == 4
    # predicate travels through the JDBC scan
    assert back.where("id > 15").count() == 5


def test_jdbc_merge_append_skips_conflicts_and_replays_idempotently(
    spark, derby_url
):
    from bigquery_postgres_events_etl_spark.sources.sinks import (
        write_jdbc_merge_append,
    )

    schema = "event_id long, user_id long, event_type string"
    base = spark.createDataFrame(
        [(1, 10, "click"), (2, 11, "view"), (3, 12, "purchase")], schema
    )
    (
        base.write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "app_events")
        .option("driver", DRIVER)
        .mode("append")
        .save()
    )

    # overlapping batch: 2 collides (same key, conflicting payload — the
    # retention contract keeps the FIRST write), 4 and 5 are new
    batch = spark.createDataFrame(
        [(2, 99, "SHOULD_NOT_REPLACE"), (4, 13, "click"), (5, 14, "view")],
        schema,
    )
    write_jdbc_merge_append(
        batch, derby_url, "app_events", conflict_keys=["event_id"],
        driver=DRIVER,
    )

    def read():
        return (
            spark.read.format("jdbc")
            .option("url", derby_url)
            .option("dbtable", "app_events")
            .option("driver", DRIVER)
            .load()
        )

    expect = [
        (1, 10, "click"),
        (2, 11, "view"),  # conflict SKIPPED, original retained
        (3, 12, "purchase"),
        (4, 13, "click"),
        (5, 14, "view"),
    ]
    assert _rows(read()) == expect

    # crash-and-retry replay: merging the same batch again changes
    # NOTHING — the exactly-once-effect contract the watermark loop
    # relies on (commit-then-advance can safely re-run the write)
    write_jdbc_merge_append(
        batch, derby_url, "app_events", conflict_keys=["event_id"],
        driver=DRIVER,
    )
    assert _rows(read()) == expect
