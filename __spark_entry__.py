"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual registry lives in
``bigquery_postgres_events_etl_spark.registry``; operator modules
register (spark_fn, oracle_sql) pairs there.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this module by file path from any CWD; make the
# package resolvable regardless
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's full extract pipeline (filters → nested param
    extraction → projection → idempotent dedup) as one declarative
    Spark plan (reference: extract_bq.py:86-185).
    """
    from bigquery_postgres_events_etl_spark.io import load_table
    from bigquery_postgres_events_etl_spark.operators.etl import flagship_pipeline

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    return flagship_pipeline(events)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from bigquery_postgres_events_etl_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twins for each entry in ``queries()``.

    Keys absent here (non-SQL-expressible ops) get the driver's weaker
    rows-only check.
    """
    from bigquery_postgres_events_etl_spark.registry import all_oracles

    return all_oracles()
