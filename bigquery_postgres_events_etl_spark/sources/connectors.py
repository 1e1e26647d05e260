"""Production source connectors — BigQuery and JDBC/PostgreSQL.

The fixture harness reads parquet (io.load_table); in production the
same pipelines read the GA4 export directly from BigQuery and write
to PostgreSQL. Both connectors are *configuration*, not code: the
pipeline operators take DataFrames and never know the source.

Neither connector's jar/driver ships in this container, so these
builders validate and assemble the reader configs (unit-tested) and
raise a clear error only at `.load()` time if the format is missing.

Pushdown parity with the reference (SURVEY §4):
- BigQuery DSv2 pushes filters + required columns into the BigQuery
  Storage Read API — the `_TABLE_SUFFIX`/projection pushdown the
  reference hand-builds into SQL strings (extract_bq.py:102-115);
- JDBC pushes predicates (`pushDownPredicate`, on by default) and
  reads with partitioned parallelism on a numeric column.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class BigQueryEventsSource:
    """Reader config for GA4-export day-sharded events
    (`{project}.{dataset}.events_*`, reference: extract_bq.py:96)."""

    project: str
    dataset: str
    table_prefix: str = "events_"

    def reader_options(self, date_from: str, date_to: str) -> dict[str, str]:
        """Options for spark.read.format('bigquery'); the date-shard
        restriction rides on the filter option → Storage API pushdown
        (the reference's `_TABLE_SUFFIX BETWEEN`, extract_bq.py:110)."""
        suffix_from = date_from.replace("-", "")
        suffix_to = date_to.replace("-", "")
        return {
            "table": f"{self.project}.{self.dataset}.{self.table_prefix}*",
            "filter": f"_TABLE_SUFFIX BETWEEN '{suffix_from}' AND '{suffix_to}'",
            "viewsEnabled": "true",
        }

    def build_pushdown_sql(
        self, date_from: str, date_to: str, events: list[str] | None = None
    ) -> str:
        """The pushed-down SQL the reference hand-builds
        (extract_bq.py:86-117): shard-suffix range + valid-user +
        optional tracked-event IN list, projecting the extract columns.
        Used when `query`-mode reading (viewsEnabled) is preferred over
        filter-option pushdown; semantics are differentially tested
        against the declarative operators via the DuckDB stand-in
        (``duckdb_standin_sql``, tests/test_connector_pushdown.py)."""
        suffix_from = date_from.replace("-", "")
        suffix_to = date_to.replace("-", "")
        event_filter = ""
        if events:
            # escape for GoogleSQL string literals: backslash-escape
            # backslashes then quotes ('' doubling is Postgres/DuckDB
            # dialect, NOT valid in BigQuery — it would end the literal
            # and let an event name break or inject into the SQL)
            event_list = "', '".join(
                e.replace("\\", "\\\\").replace("'", "\\'") for e in events
            )
            event_filter = f"\n            AND event_name IN ('{event_list}')"
        table_wildcard = f"{self.project}.{self.dataset}.{self.table_prefix}*"
        return (
            "SELECT user_id, event_name, event_timestamp, event_params, event_date\n"
            f"        FROM `{table_wildcard}`\n"
            f"        WHERE _TABLE_SUFFIX BETWEEN '{suffix_from}' AND '{suffix_to}'\n"
            "            AND user_id IS NOT NULL\n"
            "            AND user_id != ''"
            f"{event_filter}\n"
            "        ORDER BY event_timestamp DESC"
        )

    def load(self, spark: SparkSession, date_from: str, date_to: str) -> DataFrame:
        reader = spark.read.format("bigquery")
        for k, v in self.reader_options(date_from, date_to).items():
            reader = reader.option(k, v)
        try:
            return reader.load()
        except Exception as e:  # pragma: no cover — needs the BQ connector jar
            raise NotImplementedError(
                "BigQuery connector jar not on the classpath; add "
                "spark-bigquery-with-dependencies and rerun (config is valid)"
            ) from e


def duckdb_standin_sql(
    date_from: str, date_to: str, events: list[str] | None = None
) -> str:
    """DuckDB twin of ``build_pushdown_sql`` over the fixture events
    table — same WHERE semantics, fixture schema: the day shard a row
    would live in is ``strftime(ts, '%Y%m%d')`` (X2), user validity is
    NOT NULL (the fixture user_id is numeric, so the reference's
    ``!= ''`` arm is vacuous — operators.etl.valid_user_filter applies
    the same contract), and the IN list filters ``event_type``.

    Running this against the same parquet the Spark operators read
    gives a differential test of the *pushdown builder's semantics*
    (range inclusivity at both endpoints, null handling, IN-list
    construction) without a BigQuery backend.
    """
    event_filter = ""
    if events:
        # '' doubling is the correct escape for DuckDB (and Postgres);
        # the BigQuery builder above uses backslash escapes — the two
        # dialects genuinely differ here, so the twins intentionally
        # diverge in escape style while agreeing in semantics.
        event_list = "', '".join(e.replace("'", "''") for e in events)
        event_filter = f" AND event_type IN ('{event_list}')"
    suffix_from = date_from.replace("-", "")
    suffix_to = date_to.replace("-", "")
    return (
        "SELECT event_id, user_id, event_type, "
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events "
        f"WHERE strftime(CAST(ts AS TIMESTAMP), '%Y%m%d') "
        f"BETWEEN '{suffix_from}' AND '{suffix_to}' "
        f"AND user_id IS NOT NULL{event_filter}"
    )


@dataclass(frozen=True)
class JdbcTableSource:
    """Partition-parallel JDBC reader (PostgreSQL application_events
    in the reference deployment; exercised for REAL against embedded
    Apache Derby — whose driver ships with Spark — in
    tests/test_jdbc_derby.py, including the partition-split read)."""

    url: str  # jdbc:postgresql://host:5432/db
    table: str
    user: str | None = None
    partition_column: str = "id"
    num_partitions: int = 8
    driver: str | None = None  # e.g. org.apache.derby.jdbc.EmbeddedDriver

    def reader_options(self, lower: int, upper: int) -> dict[str, str]:
        opts = {
            "url": self.url,
            "dbtable": self.table,
            "partitionColumn": self.partition_column,
            "lowerBound": str(lower),
            "upperBound": str(upper),
            "numPartitions": str(self.num_partitions),
            "pushDownPredicate": "true",
            "fetchsize": "10000",
        }
        if self.user is not None:
            opts["user"] = self.user
        if self.driver is not None:
            opts["driver"] = self.driver
        return opts

    def load(self, spark: SparkSession, lower: int, upper: int) -> DataFrame:
        reader = spark.read.format("jdbc")
        for k, v in self.reader_options(lower, upper).items():
            reader = reader.option(k, v)
        try:
            return reader.load()
        except Exception as e:  # pragma: no cover — needs the JDBC driver
            raise NotImplementedError(
                "PostgreSQL JDBC driver not on the classpath (config is valid)"
            ) from e
