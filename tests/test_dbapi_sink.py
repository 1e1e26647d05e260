"""End-to-end mechanics of the partition-parallel DBAPI upsert writer
(K2/K3/K4) against in-container SQLite — `INSERT OR IGNORE` has the
same skip-on-duplicate semantics as the reference's PostgreSQL
`ON CONFLICT DO NOTHING` (extract_bq.py:216-258), so per-partition
connections, batch chunking, commit ordering, replay idempotence, and
mid-write failure recovery are all provable without a PG server.
"""

from __future__ import annotations

import sqlite3
import sys
from functools import partial

import pytest
from pyspark import cloudpickle

# test-module helpers ride inside foreachPartition closures; pickle
# them by value — Spark's python workers can't import the tests dir
cloudpickle.register_pickle_by_value(sys.modules[__name__])

from bigquery_postgres_events_etl_spark.io import load_table
from bigquery_postgres_events_etl_spark.operators.etl import flagship_pipeline
from bigquery_postgres_events_etl_spark.schemas import (
    APPLICATION_EVENTS_DEDUP_KEY,
    CSV_EXPORT_COLUMNS,
)
from bigquery_postgres_events_etl_spark.sources.sinks import write_dbapi_upsert

DDL = """
CREATE TABLE IF NOT EXISTS application_events (
    user_id TEXT,
    event_date TEXT,
    event_timestamp INTEGER,
    event_name TEXT,
    event_id TEXT,
    event_name_detail TEXT,
    UNIQUE(user_id, event_timestamp, event_name)
)
"""


def _connect(path: str):
    # long timeout: local[32] partitions write concurrently and SQLite
    # serializes writers on the file lock
    conn = sqlite3.connect(path, timeout=60)
    return conn


def _bootstrap(path: str) -> None:
    with sqlite3.connect(path) as conn:
        conn.execute(DDL)


def _table_state(path: str):
    with sqlite3.connect(path) as conn:
        total = conn.execute("SELECT count(*) FROM application_events").fetchone()[0]
        distinct = conn.execute(
            "SELECT count(*) FROM (SELECT DISTINCT user_id, event_timestamp, "
            "event_name FROM application_events)"
        ).fetchone()[0]
    return total, distinct


def _batch(spark, sf_dir):
    return flagship_pipeline(load_table(spark, sf_dir, "events")).repartition(4)


def test_sqlite_upsert_load_then_replay_inserts_zero(spark, sf_dir, tmp_path):
    """Full load commits every partition; an identical replay is a
    durable no-op (ST3's effective exactly-once through the DB's
    conflict skip, not through writer-side state)."""
    db = str(tmp_path / "sink.db")
    _bootstrap(db)
    batch = _batch(spark, sf_dir)
    expected = batch.dropDuplicates(APPLICATION_EVENTS_DEDUP_KEY).count()

    write_dbapi_upsert(batch, partial(_connect, db), "application_events",
                       dialect="sqlite")
    total, distinct = _table_state(db)
    assert total == distinct == expected

    write_dbapi_upsert(batch, partial(_connect, db), "application_events",
                       dialect="sqlite")
    total2, distinct2 = _table_state(db)
    assert (total2, distinct2) == (total, distinct)


def test_sqlite_upsert_chunking_matches_unchunked(spark, sf_dir, tmp_path):
    """batch_size smaller than the partition row count exercises the
    chunk loop; the committed contents are identical to one big
    executemany."""
    db = str(tmp_path / "sink.db")
    _bootstrap(db)
    batch = _batch(spark, sf_dir)
    write_dbapi_upsert(batch, partial(_connect, db), "application_events",
                       batch_size=7, dialect="sqlite")
    total, distinct = _table_state(db)
    assert total == distinct == batch.dropDuplicates(
        APPLICATION_EVENTS_DEDUP_KEY
    ).count()


class _PoisonCursor:
    """Cursor that fails when a chunk contains the poison user_id —
    simulates a network/constraint failure mid-partition."""

    def __init__(self, cur, poison):
        self._cur = cur
        self._poison = poison

    def executemany(self, sql, rows):
        if any(str(r[0]) == self._poison for r in rows):
            raise RuntimeError("injected mid-write failure")
        return self._cur.executemany(sql, rows)

    def __getattr__(self, name):
        return getattr(self._cur, name)


class _PoisonConnection:
    def __init__(self, conn, poison):
        self._conn = conn
        self._poison = poison

    def cursor(self):
        return _PoisonCursor(self._conn.cursor(), self._poison)

    def __getattr__(self, name):
        return getattr(self._conn, name)


def _poison_connect(path: str, poison: str):
    return _PoisonConnection(_connect(path), poison)


def test_mid_write_failure_rolls_back_partition_then_replay_completes(
    spark, sf_dir, tmp_path
):
    """A partition that fails mid-write commits nothing (single commit
    per partition = partition-atomic); other partitions' commits
    survive; a clean replay completes the load with zero duplicates —
    the reference's crash-recovery story (DB-enforced uniqueness), held
    by the distributed writer."""
    db = str(tmp_path / "sink.db")
    _bootstrap(db)
    batch = _batch(spark, sf_dir)
    expected = batch.dropDuplicates(APPLICATION_EVENTS_DEDUP_KEY).count()
    poison = str(
        batch.select("user_id").limit(1).collect()[0][0]
    )

    with pytest.raises(Exception):
        write_dbapi_upsert(
            batch,
            partial(_poison_connect, db, poison),
            "application_events",
            batch_size=5,
            dialect="sqlite",
        )

    total_after_fail, distinct_after_fail = _table_state(db)
    assert total_after_fail == distinct_after_fail  # no partial-dup rows
    assert total_after_fail < expected  # the poisoned partition rolled back
    # no committed row belongs to a chunk containing the poison row's
    # partition-and-chunk — strictly: the poison user's key rows are absent
    with sqlite3.connect(db) as conn:
        n_poison = conn.execute(
            "SELECT count(*) FROM application_events WHERE user_id = ?",
            (poison,),
        ).fetchone()[0]
    assert n_poison == 0

    # replay with a healthy connection completes idempotently
    write_dbapi_upsert(batch, partial(_connect, db), "application_events",
                       dialect="sqlite")
    total, distinct = _table_state(db)
    assert total == distinct == expected


def test_postgres_sql_and_sqlite_sql_share_shape():
    """The two dialects build the same statement modulo placeholder and
    conflict syntax — one writer, two backends."""
    from bigquery_postgres_events_etl_spark.sources.sinks import build_upsert_sql

    pg = build_upsert_sql("t", CSV_EXPORT_COLUMNS, APPLICATION_EVENTS_DEDUP_KEY)
    sq = build_upsert_sql(
        "t", CSV_EXPORT_COLUMNS, APPLICATION_EVENTS_DEDUP_KEY, dialect="sqlite"
    )
    assert pg.startswith("INSERT INTO t (user_id, event_date, ")
    assert "ON CONFLICT (user_id, event_timestamp, event_name) DO NOTHING" in pg
    assert sq.startswith("INSERT OR IGNORE INTO t (user_id, event_date, ")
    assert sq.count("?") == len(CSV_EXPORT_COLUMNS)


def _pg_dsn():
    """Live-PostgreSQL test gate: set SPARK_GRAFT_PG_DSN (e.g.
    ``host=localhost port=5432 dbname=test user=postgres``) and have
    psycopg2 importable to exercise the real conflict-skipping path.
    The sandbox ships neither, so this normally skips — the test
    lights up automatically the moment the env allows."""
    import os

    dsn = os.environ.get("SPARK_GRAFT_PG_DSN")
    if not dsn:
        return None, "SPARK_GRAFT_PG_DSN not set (no PostgreSQL server in this env)"
    try:
        import psycopg2  # noqa: F401
    except ImportError:
        return None, "psycopg2 not installed"
    return dsn, None


def test_live_postgres_upsert_replay_idempotent(spark, sf_dir):
    """The SQLite twin proves the writer mechanics; this proves them
    against real PostgreSQL ON CONFLICT DO NOTHING when a server is
    reachable."""
    dsn, why = _pg_dsn()
    if dsn is None:
        pytest.skip(why)
    import psycopg2

    def connect():
        return psycopg2.connect(dsn)

    pg_ddl = DDL.replace("IF NOT EXISTS application_events",
                         "IF NOT EXISTS application_events_test")
    with connect() as conn:
        conn.cursor().execute("DROP TABLE IF EXISTS application_events_test")
        conn.cursor().execute(pg_ddl)

    def count():
        with connect() as conn:
            cur = conn.cursor()
            cur.execute("SELECT count(*) FROM application_events_test")
            return cur.fetchone()[0]

    out = flagship_pipeline(load_table(spark, sf_dir, "events"))
    write_dbapi_upsert(out, connect, "application_events_test", dialect="postgres")
    first = count()
    write_dbapi_upsert(out, connect, "application_events_test", dialect="postgres")
    assert first == out.count()
    assert count() == first  # replay inserts nothing
