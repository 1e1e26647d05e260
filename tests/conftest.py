from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from bigquery_postgres_events_etl_spark.session import get_spark

    # UI on: the runtime shuffle-byte assertions (test_plans) read the
    # REST status API — the same evidence channel bench.py scrapes
    os.environ.setdefault("SPARK_GRAFT_UI", "true")
    spark = get_spark(app_name="tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
