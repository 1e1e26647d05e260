"""Intent-level checks for the gap-fill resampler and the z-score
anomaly gate (the oracle proves engine agreement; these prove the
semantics)."""

from __future__ import annotations

import statistics

from pyspark.sql import functions as F

from bigquery_postgres_events_etl_spark.io import load_table
from bigquery_postgres_events_etl_spark.registry import all_queries


def test_resample_grid_is_complete_and_conserves_events(spark, sf_dir):
    rows = all_queries()["timeseries_resample_ffill"](spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    hours = {r.hour for r in rows}
    span = (max(hours) - min(hours)).total_seconds() / 3600 + 1
    for user, urows in by_user.items():
        # every user has the FULL grid — that's what gap-filling means
        assert len(urows) == span, user
        assert len({r.hour for r in urows}) == len(urows)
    # event conservation: grid counts sum to the raw filtered count
    raw = (
        load_table(spark, sf_dir, "events").where(F.col("user_id") < 20).count()
    )
    assert sum(r.n_events for r in rows) == raw
    # forward fill: a zero-event hour repeats the last seen value
    for urows in by_user.values():
        urows.sort(key=lambda r: r.hour)
        last = None
        for r in urows:
            if r.n_events == 0:
                assert r.filled_value == last
            else:
                last = r.filled_value


def test_anomaly_gate_matches_python_statistics(spark, sf_dir):
    """The flagged set equals a NumPy-free Python recompute: exactly
    the rows beyond 3 sample-stddevs of their group mean."""
    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    by_type: dict[str, list] = {}
    for r in e.collect():
        by_type.setdefault(r.event_type, []).append(r)
    expected = set()
    for t, rows in by_type.items():
        vals = [r.value for r in rows]
        mean = statistics.fmean(vals)
        std = statistics.stdev(vals)
        for r in rows:
            if abs(r.value - mean) > 3.0 * std:
                expected.add(r.event_id)
    got = {
        r.event_id for r in all_queries()["anomaly_zscore_events"](spark, sf_dir).collect()
    }
    # float-accumulation order differs between Python fsum and the
    # exact-decimal moments, so tolerate boundary rows only
    assert len(got.symmetric_difference(expected)) <= max(1, len(expected) // 50)
    assert got, "gate should flag the fixture's heavy tail"


def test_hll_daily_sketches_merge_to_range_estimate(spark, sf_dir):
    """The mergeable-sketch contract: (a) unioning per-day HLL
    sketches estimates the whole range's distinct count within the
    sketch's error bound (lgConfigK=12 → ~1.6% std error; assert 5%);
    (b) merge order is immaterial (associativity — the property that
    makes incremental rollups correct)."""
    from pyspark.sql import functions as F

    from bigquery_postgres_events_etl_spark.io import load_table

    e = load_table(spark, sf_dir, "events")
    exact = e.select(F.countDistinct("user_id")).first()[0]
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    est = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).first()["est"]
    assert abs(est - exact) <= max(1, 0.05 * exact)

    # associativity: union of two half-unions == union of all
    halves = daily.withColumn("h", F.col("day") >= F.lit("2024-01-15"))
    half_unions = halves.groupBy("h").agg(F.hll_union_agg("sk").alias("sk"))
    est2 = half_unions.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).first()["est"]
    assert est2 == est


def test_approx_topk_rollup_exact_on_small_keyspace(spark, sf_dir):
    """The mergeable top-k contract: (a) with k ≥ |key space| the
    sketch is EXACT, so the combined weekly estimates must equal the
    true per-week counts; (b) combining per-day states is
    order/grouping-immaterial — merging two half-combines equals the
    direct combine (the property that lets old daily states roll up
    without recomputation)."""
    rows = all_queries()["events_approx_topk_rollup"](spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "events")
    exact = {
        (r.week, r.event_type): r.n
        for r in e.groupBy(
            F.date_trunc("week", "ts").cast("date").alias("week"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {(r.week, r.item): r.est_count for r in rows}
    assert got == exact

    # associativity: estimate(combine(combine(half1), combine(half2)))
    # == the registry entry's single-level combine
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.expr("approx_top_k_accumulate(event_type, 10)").alias("state")
    )
    halves = (
        daily.withColumn("h", F.col("day") >= F.lit("2024-01-15"))
        .groupBy("h")
        .agg(F.expr("approx_top_k_combine(state, 10)").alias("state"))
    )
    two_level = {
        (r.t.item, r.t["count"])
        for r in halves.agg(
            F.expr("approx_top_k_estimate(approx_top_k_combine(state, 10), 10)").alias("top")
        )
        .select(F.explode("top").alias("t"))
        .collect()
    }
    total_exact = {
        (r.event_type, r.n)
        for r in e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert two_level == total_exact


def test_interpolate_linear_invariants(spark, sf_dir):
    """Gap rows sit on the segment between their bracketing knowns
    (convexity), known hours pass through untouched, and edge gaps
    (before the first / after the last known point) stay NULL."""
    from bigquery_postgres_events_etl_spark.registry import all_queries

    rows = (
        all_queries()["timeseries_interpolate_linear"](spark, sf_dir)
        .orderBy("user_id", "hour")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    n_gap_interp = 0
    for series in by_user.values():
        knowns = [i for i, r in enumerate(series) if r.n_events > 0]
        if not knowns:
            continue
        first_k, last_k = knowns[0], knowns[-1]
        for i, r in enumerate(series):
            if i < first_k or i > last_k:
                assert r.interp_value is None
            elif r.n_events == 0 and r.interp_value is not None:
                n_gap_interp += 1
                prev_v = next(
                    series[j].interp_value for j in reversed(knowns) if j < i
                )
                next_v = next(series[j].interp_value for j in knowns if j > i)
                lo, hi = min(prev_v, next_v), max(prev_v, next_v)
                assert lo - 1e-9 <= r.interp_value <= hi + 1e-9
    assert n_gap_interp > 0  # the fixture actually has interior gaps


def test_holt_smoothing_linear_and_constant_series(spark):
    """Fixed-point Holt: on an exactly linear series the one-step
    forecast converges to the exact next value (trend locks to the
    slope); on a constant series the trend stays 0 and the level
    stays pinned to the constant."""
    import datetime
    import tempfile

    from bigquery_postgres_events_etl_spark.registry import all_queries
    from bigquery_postgres_events_etl_spark.operators.queries_stattests import (
        HOLT_SCALE,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(25):
        # 'lin': count 10 + 2*d per day; 'const': 7 per day
        for _ in range(10 + 2 * d):
            rows.append((eid, base + datetime.timedelta(days=d), 1, "lin")); eid += 1
        for _ in range(7):
            rows.append((eid, base + datetime.timedelta(days=d), 1, "const")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.mode("overwrite").parquet(tmp + "/events.parquet")
        out = all_queries()["events_holt_smoothing"](spark, tmp).collect()
    lin = sorted((r for r in out if r.event_type == "lin"), key=lambda r: r.day)
    const = sorted((r for r in out if r.event_type == "const"), key=lambda r: r.day)
    # constant series: level == 7*S and trend == 0 from day one
    assert all(r.trend_fp == 0 for r in const)
    assert all(r.level_fp == 7 * HOLT_SCALE for r in const)
    # linear series: α=β=1/4 converges geometrically — after 25 days
    # the one-step forecast is within a fraction of one count unit of
    # the true next value and the trend has locked near the slope (2)
    true_next = (10 + 2 * 25) * HOLT_SCALE
    assert abs(lin[-1].forecast_next_fp - true_next) < HOLT_SCALE
    assert abs(lin[-1].trend_fp - 2 * HOLT_SCALE) < HOLT_SCALE // 2


def test_allen_relations_planted_intervals(spark):
    """Each planted session pair classifies to its Allen relation:
    equals, started_by, meets, contains — with boundary ties handled
    by the top-down CASE."""
    import datetime
    import tempfile

    from bigquery_postgres_events_etl_spark.registry import all_queries

    t0 = datetime.datetime(2024, 5, 1)

    def ev(eid, uid, minutes):
        return (eid, t0 + datetime.timedelta(minutes=minutes), uid, "view")

    rows = [
        # user 1: session [0, 120] (events every 20 min — gap < 30)
        *[ev(i, 1, m) for i, m in enumerate(range(0, 121, 20))],
        # user 2: identical span [0, 120] -> equals
        *[ev(100 + i, 2, m) for i, m in enumerate(range(0, 121, 20))],
        # user 3: [0, 60] -> (1,3) started_by
        *[ev(200 + i, 3, m) for i, m in enumerate(range(0, 61, 20))],
        # user 4: [120, 180] -> (1,4) meets
        *[ev(300 + i, 4, m) for i, m in enumerate(range(120, 181, 20))],
        # user 5: [30, 90] -> (1,5) contains
        *[ev(400 + i, 5, m) for i, m in enumerate(range(30, 91, 20))],
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(tmp + "/events.parquet")
        out = {
            (r.user_a, r.user_b): r.relation
            for r in all_queries()["interval_allen_relations"](spark, tmp).collect()
        }
    assert out[(1, 2)] == "equals"
    assert out[(1, 3)] == "started_by"
    assert out[(1, 4)] == "meets"
    assert out[(1, 5)] == "contains"
    assert out[(3, 5)] == "overlaps"  # [0,60] vs [30,90]
