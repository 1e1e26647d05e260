"""Shuffle/input metrics per headline query — measured, not claimed.

Runs the bench headline with the Spark UI enabled, tags each query
with a job group, then aggregates per-query input bytes, shuffle
read/write bytes, and task counts from the REST API
(/api/v1/applications/{app}/jobs + /stages). This is the evidence
behind SCALE.md's shuffle inventory: a query whose design says "one
exchange" must show one shuffle's worth of bytes, not a cascade.

Usage: python tools/bench_metrics.py [sf_dir]   → JSON lines per query
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, "/root/repo")


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.loads(r.read())


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    os.environ.setdefault("SPARK_GRAFT_UI", "true")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]")
        .appName("bench-metrics")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4099")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    base = "http://localhost:4099"

    from bench import HEADLINE
    from bigquery_postgres_events_etl_spark.registry import all_queries

    qs = all_queries()
    sc = spark.sparkContext
    for name in HEADLINE:
        sc.setJobGroup(name, name)
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    sc.setJobGroup("", "")

    app_id = sc.applicationId
    jobs = _api(base, f"applications/{app_id}/jobs")
    stages = {s["stageId"]: s for s in _api(base, f"applications/{app_id}/stages")}

    per_query: dict[str, dict] = {}
    for job in jobs:
        group = job.get("jobGroup")
        if group not in qs:
            continue
        m = per_query.setdefault(
            group,
            {"input_mb": 0.0, "shuffle_read_mb": 0.0, "shuffle_write_mb": 0.0, "tasks": 0},
        )
        for sid in job.get("stageIds", []):
            s = stages.get(sid)
            if not s or s.get("status") == "SKIPPED":
                continue
            m["input_mb"] += s.get("inputBytes", 0) / 1e6
            m["shuffle_read_mb"] += s.get("shuffleReadBytes", 0) / 1e6
            m["shuffle_write_mb"] += s.get("shuffleWriteBytes", 0) / 1e6
            m["tasks"] += s.get("numCompleteTasks", 0)

    for name in HEADLINE:
        m = per_query.get(name, {})
        print(json.dumps({"query": name, **{k: round(v, 2) for k, v in m.items()}}))


if __name__ == "__main__":
    main()
