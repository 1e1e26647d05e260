"""Per-query JOB-LEVEL profile — where a bench query's wall time goes.

Runs one registry entry through the noop sink (after an untimed warm
run, matching bench.py's steady state), then lists every Spark job the
timed run launched with its wall duration, stage/task counts and
shuffle bytes from the UI REST API. The per-job breakdown is the
signal bench.py's single number hides: an iterative operator spending
its wall on 20 ×100 ms job launches shows up here as 20 rows, not as
"compute".

Usage: python tools/job_profile.py <query> [sf_dir] [--runs N]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=30) as r:
        return json.loads(r.read())


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    runs = 1
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1])

    os.environ["SPARK_GRAFT_UI"] = "true"
    from bigquery_postgres_events_etl_spark.registry import all_queries
    from bigquery_postgres_events_etl_spark.session import get_spark

    spark = get_spark(app_name=f"job-profile-{name}")
    sc = spark.sparkContext
    qs = all_queries()
    fn = qs[name]

    # warmup: JVM/codegen + the query's own persisted slivers
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spark.catalog.clearCache()
    sc.setJobGroup(f"{name}#warm", name)
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    walls = []
    for i in range(runs):
        spark.catalog.clearCache()
        sc.setJobGroup(f"{name}#warm{i}", name)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        sc.setJobGroup(f"{name}#timed{i}", name)
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(time.time() - t0)
    sc.setJobGroup("", "")

    base = sc.uiWebUrl
    app_id = sc.applicationId
    jobs = _api(base, f"applications/{app_id}/jobs")
    stages = {s["stageId"]: s for s in _api(base, f"applications/{app_id}/stages")}

    from datetime import datetime

    def ts(s: str) -> float:
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    per_run: dict[str, list[dict]] = {}
    for job in jobs:
        group = job.get("jobGroup") or ""
        if not group.startswith(f"{name}#timed"):
            continue
        dur = ts(job["completionTime"]) - ts(job["submissionTime"])
        smb = 0.0
        ntasks = 0
        nst = 0
        for sid in job.get("stageIds", []):
            s = stages.get(sid)
            if not s or s.get("status") == "SKIPPED":
                continue
            nst += 1
            smb += (s.get("shuffleWriteBytes", 0)) / 1e6
            ntasks += s.get("numCompleteTasks", 0)
        per_run.setdefault(group, []).append(
            {
                "job": job["jobId"],
                "desc": (job.get("description") or "")[:60],
                "sec": round(dur, 3),
                "stages": nst,
                "tasks": ntasks,
                "shuffle_mb": round(smb, 2),
                "submitted": job["submissionTime"][11:23],
            }
        )

    for group in sorted(per_run):
        rows = sorted(per_run[group], key=lambda r: r["job"])
        tot = sum(r["sec"] for r in rows)
        print(f"\n== {group}: {len(rows)} jobs, job-sec sum {tot:.3f} ==")
        for r in rows:
            print(
                f"  job {r['job']:>4} {r['submitted']} {r['sec']:7.3f}s "
                f"stages={r['stages']} tasks={r['tasks']:>4} "
                f"shuf={r['shuffle_mb']:>8.2f}MB  {r['desc']}"
            )
    print(f"\nwalls: {[round(w, 3) for w in walls]}")


if __name__ == "__main__":
    main()
