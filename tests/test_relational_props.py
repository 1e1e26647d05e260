"""Accuracy contracts for approximate aggregates (the rows-only
sketch entry) and decomposition invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigquery_postgres_events_etl_spark.io import load_table
from bigquery_postgres_events_etl_spark.registry import all_queries


def test_approx_count_distinct_accuracy(spark, sf_dir):
    """HLL++ default rsd is 5%; assert within 10% of exact."""
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select("l_orderkey").distinct().count()
    approx = all_queries()["approx_aggregates"](spark, sf_dir).first()["approx_orders"]
    assert abs(approx - exact) / exact < 0.10


def test_percentile_approx_brackets(spark, sf_dir):
    row = all_queries()["approx_aggregates"](spark, sf_dir).first()
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    ).first()
    assert stats.lo <= row.approx_median_price <= row.approx_p99_price <= stats.hi


def test_salted_equals_plain_groupby(spark, sf_dir):
    """Salting must be answer-preserving (also oracle-checked; this
    pins it against the in-engine plain plan too)."""
    from bigquery_postgres_events_etl_spark.operators.skew import (
        salted_group_count_sum,
    )

    e = load_table(spark, sf_dir, "events")
    salted = salted_group_count_sum(e, "user_id", "value", num_salts=8)
    plain = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").cast("decimal(27,4)")).cast("double").alias("sum_value"),
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_part_similarity_topk_properties(spark, sf_dir):
    """Item-item cosine recommender: formula parity against a pandas
    recomputation, symmetric co-occurrence counts, per-item top-5
    contract with deterministic ranks."""
    import math
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq

    from bigquery_postgres_events_etl_spark.registry import all_queries

    rows = all_queries()["part_similarity_topk"](spark, sf_dir).collect()
    li = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pandas()
    items = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    n_orders = Counter(items.l_partkey)
    pair = Counter()
    for _, grp in items.groupby("l_orderkey"):
        parts = sorted(grp.l_partkey)
        for i, p in enumerate(parts):
            for q in parts[i + 1 :]:
                pair[(p, q)] += 1
    by_part = defaultdict(list)
    for r in rows:
        by_part[r.part].append(r)
        key = (min(r.part, r.neighbor), max(r.part, r.neighbor))
        assert pair[key] == r.n_together  # symmetric count parity
        assert r.n_together >= 2
        want = r.n_together / math.sqrt(n_orders[r.part] * n_orders[r.neighbor])
        assert abs(r.cosine - want) < 1e-12
    for part, rs in by_part.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        # ranks follow (cosine desc, neighbor asc)
        for x, y in zip(rs, rs[1:]):
            assert (x.cosine, -x.neighbor) >= (y.cosine, -y.neighbor) or (
                x.cosine > y.cosine
            )
        # every ranked neighbor beats any unranked qualifying pair
        if len(rs) == 5:
            floor = min(r.cosine for r in rs)
            ranked = {r.neighbor for r in rs}
            for (p, q), c in pair.items():
                if c < 2:
                    continue
                for me, other in ((p, q), (q, p)):
                    if me == part and other not in ranked:
                        cos = c / math.sqrt(n_orders[me] * n_orders[other])
                        assert cos <= floor + 1e-12
