"""Benchmark harness — runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full plan
execution, no driver collect — results never leave the executors,
matching how these plans run on a cluster).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "etl_flagship",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q8_market_share",
    "q10_returned_items",
    "q18_large_orders",
    "join_sort_merge_fact",
    "window_topk_per_group",
    "sessionization",
    "asof_join_last_click",
    "tumbling_window_hourly",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_topk_bruteforce",
    "text_tfidf_top_terms",
    "multimodal_feature_extract",
]

# Second tier (r6 verdict item #6): the heavy operators added in
# rounds 4-6 that the frozen r1 headline set never measured — without
# them the official perf trend is blind to regressions in exactly the
# most expensive plans. Kept SEPARATE from HEADLINE so the r1-r6
# first-tier totals stay comparable: the final line's "value" remains
# the HEADLINE sum; tier-2 medians ride in "queries2" (+"value2").
TIER2 = [
    "dedup_entity_resolve",
    "dedup_minhash_jaccard_est",
    "etl_scd2_user_state",
    "events_markov_attribution",
    "graph_pagerank_copurchase",
    "pipeline_paragraph_dedup",
    "pipeline_corpus_prep_full",
    "text_nb_quality_score",
]


def _shuffle_metrics(spark, names: list[str]) -> dict[str, dict]:
    """Per-query shuffle bytes / task counts from the REST API — the
    plan-health signal that grades rounds (wall clock on this shared
    container has ±30% noise; shuffle bytes don't). Job groups tagged
    ``{name}#r1`` (the steady-state second run) are aggregated over
    non-skipped stages. Returns {} if the UI is unavailable."""
    import urllib.request

    try:
        base = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId

        def api(path: str):
            with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=30) as r:
                return json.loads(r.read())

        jobs = api(f"applications/{app_id}/jobs")
        stages = {s["stageId"]: s for s in api(f"applications/{app_id}/stages")}
        out: dict[str, dict] = {}
        for job in jobs:
            group = job.get("jobGroup") or ""
            if not group.endswith("#r1"):
                continue
            name = group[: -len("#r1")]
            if name not in names:
                continue
            m = out.setdefault(name, {"shuffle_mb": 0.0, "tasks": 0})
            for sid in job.get("stageIds", []):
                s = stages.get(sid)
                if not s or s.get("status") == "SKIPPED":
                    continue
                m["shuffle_mb"] += s.get("shuffleWriteBytes", 0) / 1e6
                m["tasks"] += s.get("numCompleteTasks", 0)
        return {
            n: {"shuffle_mb": round(m["shuffle_mb"], 2), "tasks": m["tasks"]}
            for n, m in out.items()
        }
    except Exception:
        return {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # the UI powers the per-query shuffle metrics; REST polling happens
    # once after all timed runs, so it doesn't perturb the timings
    os.environ.setdefault("SPARK_GRAFT_UI", "true")

    from bigquery_postgres_events_etl_spark.registry import all_queries
    from bigquery_postgres_events_etl_spark.session import get_spark

    spark = get_spark(app_name="bench")
    # the fixtures' naive timestamps are only correct under a UTC
    # session zone; assert the invariant at action time, not just load
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    qs = all_queries()

    # JVM/codegen warmup on the smallest table
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    # three timed runs per query in one session: the first run pays
    # codegen JIT, later runs are steady-state, and single-run noise on
    # this shared container is ±30% — so the MEDIAN is the headline
    # number (robust to one noisy run in either direction), with min
    # and spread (max−min) recorded per query so a "regression" can be
    # told from a wobble without burning a verdict cycle.
    timings: dict[str, float] = {}
    timings2: dict[str, float] = {}
    detail: dict[str, dict[str, float]] = {}
    sc = spark.sparkContext
    for name in HEADLINE + TIER2:
        fn = qs[name]
        # Cache hygiene: several operators persist() intermediate
        # frames (shingle/signature slivers) and intentionally never
        # unpersist (the returned lazy plan references the cache).
        # Within one query's 3 runs that reuse is the steady-state
        # being measured; ACROSS queries it would accumulate ~18
        # cached frames in this shared session and let the cache
        # manager substitute one query's persisted subtree into a
        # later query's plan — so the slate is wiped per query, same
        # as check_oracle and the driver gate (fresh session there).
        spark.catalog.clearCache()
        runs: list[float] = []
        for i in range(3):
            sc.setJobGroup(f"{name}#r{i}", name)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        runs.sort()
        (timings if name in HEADLINE else timings2)[name] = round(runs[1], 3)
        detail[name] = {
            "median": round(runs[1], 3),
            "min": round(runs[0], 3),
            "spread": round(runs[-1] - runs[0], 3),
        }
    sc.setJobGroup("", "")

    total = round(sum(timings.values()), 3)
    # The driver captures only the LAST ~2,000 bytes of stdout; r5's
    # final line grew to 2,971 bytes (per-query detail + shuffle) and
    # the round lost its official bench record ("parsed": null). The
    # final line is therefore kept compact — medians only — and the
    # full median/min/spread + shuffle-byte detail goes to a sidecar
    # file, BENCH_DETAIL.json, next to this script.
    sidecar = {
        "queries_detail": detail,
        "shuffle": _shuffle_metrics(spark, HEADLINE + TIER2),
        "sf": sf,
        "protocol": "median-of-3, noop sink, shared warm session",
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
        "w",
    ) as f:
        json.dump(sidecar, f, indent=1)
    line = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "value2": round(sum(timings2.values()), 3),
            "queries2": timings2,
            "sf": sf,
        }
    )
    # The driver reads the LAST line of stdout, so print FIRST and
    # only then complain about the length: an assert before the print
    # (the r6 shape) would lose the round's official record to a
    # traceback — the exact failure this guard exists to prevent —
    # and asserts vanish under `python -O`.
    print(line, flush=True)
    if len(line) >= 1500:
        raise SystemExit(
            f"final bench line {len(line)}B > driver tail window (1500B); "
            "the line above was still printed — move per-query timings "
            "to BENCH_DETAIL.json"
        )


if __name__ == "__main__":
    main()
