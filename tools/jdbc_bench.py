"""JDBC (embedded Derby) performance characterization — SCALE.md's
"JDBC sink/source" section (r8 verdict item #4: the leg became a real
execution path in r8 with zero perf data).

Measures, against a throwaway embedded-Derby database:

1. ``write_jdbc_merge_append`` rows/s at two batch sizes (the sf0.1
   flagship batch and a 10× amplified one), split into its two legs —
   executor-parallel staging write vs the single set-based MERGE —
   via the ``timings`` hook;
2. the replay (100%-conflict) MERGE — the daily idempotent-retry case:
   all-match, zero inserts;
3. staging-write partition-parallelism (1 vs 8 partitions) and the
   reference's batchsize=1000 vs the Spark JDBC default;
4. ``JdbcTableSource`` partition-split parallel read rows/s (1 vs 8
   range splits).

Embedded Derby shares the JVM: there is no network hop, so absolute
numbers flatter a remote PG; the RELATIVE splits (staging vs MERGE,
parallelism scaling, batch sizing) are the transferable signal and
are what SCALE.md quotes.

Usage: python tools/jdbc_bench.py  [sf_dir]  (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AMPLIFY = 10


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from bigquery_postgres_events_etl_spark.io import load_table
    from bigquery_postgres_events_etl_spark.operators.etl import flagship_pipeline
    from bigquery_postgres_events_etl_spark.session import get_spark
    from bigquery_postgres_events_etl_spark.sources.connectors import JdbcTableSource
    from bigquery_postgres_events_etl_spark.sources.sinks import (
        write_jdbc_merge_append,
    )

    spark = get_spark(app_name="jdbc-bench")
    tmp = tempfile.mkdtemp(prefix="jdbc_bench_")
    results: dict[str, dict] = {}

    def fresh_url(tag: str) -> str:
        return f"jdbc:derby:{tmp}/{tag};create=true"

    base = flagship_pipeline(load_table(spark, sf_dir, "events")).persist()
    n_base = base.count()
    # amplified copies get a disjoint key space (ts offset by k decades
    # in µs) so the first MERGE's conflict rate stays realistic (0%)
    decade_us = 10 * 365 * 24 * 3600 * 1_000_000
    amp = base
    for k in range(1, AMPLIFY):
        amp = amp.unionAll(
            base.withColumn(
                "event_timestamp", F.col("event_timestamp") + F.lit(k * decade_us)
            )
        )
    amp = amp.persist()
    n_amp = amp.count()
    keys = ["user_id", "event_timestamp", "event_name"]

    # -- 1+2: merge-append at two scales, fresh + full-replay ---------
    for tag, df, n in (("sf0.1", base, n_base), ("sf1", amp, n_amp)):
        url = fresh_url(f"m_{tag.replace('.', '')}")
        t = {}
        t0 = time.time()
        ins = write_jdbc_merge_append(df, url, "app_events", keys, timings=t)
        wall = time.time() - t0
        rt = {}
        t1 = time.time()
        re_ins = write_jdbc_merge_append(df, url, "app_events", keys, timings=rt)
        rwall = time.time() - t1
        results[f"merge_append_{tag}"] = {
            "rows": n,
            "inserted": ins,
            "wall_s": round(wall, 2),
            "rows_per_s": round(n / wall),
            "staging_write_s": round(t["staging_write_s"], 2),
            "merge_s": round(t["merge_s"], 2),
            "replay_inserted": re_ins,
            "replay_wall_s": round(rwall, 2),
            "replay_merge_s": round(rt["merge_s"], 2),
        }
        print(f"# merge_append_{tag}: {results[f'merge_append_{tag}']}", file=sys.stderr)

    # -- 3: staging parallelism & batchsize (write-only, overwrite) ---
    for tag, parts, opts in (
        ("p1", 1, None),
        ("p8", 8, None),
        ("p8_batch1000", 8, {"batchsize": "1000"}),
    ):
        url = fresh_url(f"w_{tag}")
        d = base.repartition(parts)
        w = (
            d.write.format("jdbc")
            .option("url", url)
            .option("dbtable", "stage_t")
            .mode("overwrite")
        )
        for k, v in (opts or {}).items():
            w = w.option(k, v)
        t0 = time.time()
        w.save()
        wall = time.time() - t0
        results[f"staging_write_{tag}"] = {
            "rows": n_base,
            "partitions": parts,
            "options": opts or {},
            "wall_s": round(wall, 2),
            "rows_per_s": round(n_base / wall),
        }

    # -- 4: partition-split parallel read -----------------------------
    url = fresh_url("r")
    read_df = base.withColumn("rid", F.monotonically_increasing_id())
    read_df.write.format("jdbc").option("url", url).option(
        "dbtable", "read_t"
    ).mode("overwrite").save()
    lo, hi = 0, read_df.agg(F.max("rid")).first()[0]
    for parts in (1, 8):
        src = JdbcTableSource(url, "read_t", partition_column="rid", num_partitions=parts)
        t0 = time.time()
        got = src.load(spark, lo, hi).count()
        wall = time.time() - t0
        results[f"partition_read_p{parts}"] = {
            "rows": got,
            "partitions": parts,
            "wall_s": round(wall, 2),
            "rows_per_s": round(got / wall),
        }

    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
