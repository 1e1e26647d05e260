"""Connected-components correctness: the iterative DataFrame label
propagation must equal a union-find oracle on the same pairs (the
rows-only registry entry's real check)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigquery_postgres_events_etl_spark.io import load_table, parallelize
from bigquery_postgres_events_etl_spark.operators.cluster import (
    connected_components,
    dup_clusters,
)
from bigquery_postgres_events_etl_spark.operators.dedup import minhash_lsh_pairs


def _union_find(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min member id per root
    comp: dict[int, list[int]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for root, members in comp.items() for n in members}


def test_connected_components_equal_union_find(spark, sf_dir):
    pairs_df = minhash_lsh_pairs(parallelize(load_table(spark, sf_dir, "documents")))
    pairs = [(r.doc_a, r.doc_b) for r in pairs_df.collect()]
    assert pairs, "fixture should contain planted near-duplicates"

    got = {
        r.node: r.comp for r in connected_components(pairs_df).collect()
    }
    want = _union_find(pairs)
    assert got == want


def test_connected_components_chain(spark):
    """A long path graph exercises multi-round propagation (worst-case
    diameter), not just the near-clique dup shape."""
    chain = [(i, i + 1) for i in range(0, 20)]
    df = spark.createDataFrame(chain, ["doc_a", "doc_b"])
    got = {r.node: r.comp for r in connected_components(df).collect()}
    assert got == {i: 0 for i in range(0, 21)}


def test_dup_clusters_canonical_and_sizes(spark, sf_dir):
    pairs_df = minhash_lsh_pairs(parallelize(load_table(spark, sf_dir, "documents")))
    cl = dup_clusters(pairs_df)
    rows = cl.collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        ids = sorted(m.doc_id for m in members)
        assert cid == ids[0]  # cluster id is the min member
        assert all(m.cluster_size == len(members) for m in members)
        canon = [m for m in members if m.is_canonical]
        assert len(canon) == 1 and canon[0].doc_id == cid
    # deletion invariant: dropping non-canonical rows removes
    # exactly (cluster_size - 1) docs per cluster
    n_total = len(rows)
    n_keep = cl.where(F.col("is_canonical")).count()
    assert n_keep == len(by_cluster)
    assert n_total - n_keep == sum(len(m) - 1 for m in by_cluster.values())


def test_star_components_equal_union_find(spark, sf_dir):
    from bigquery_postgres_events_etl_spark.operators.cluster import (
        connected_components_star,
    )

    pairs_df = minhash_lsh_pairs(parallelize(load_table(spark, sf_dir, "documents")))
    pairs = [(r.doc_a, r.doc_b) for r in pairs_df.collect()]
    got = {r.node: r.comp for r in connected_components_star(pairs_df).collect()}
    assert got == _union_find(pairs)


def test_star_components_adversarial_chain(spark):
    """A 300-node path has diameter 299 — beyond any reasonable
    O(diameter) budget; large-star/small-star must converge in
    O(log n) ≈ 9 rounds (max_iter=20 is the proof)."""
    from bigquery_postgres_events_etl_spark.operators.cluster import (
        connected_components_star,
    )

    n = 300
    chain = [(i, i + 1) for i in range(n)]
    df = spark.createDataFrame(chain, ["doc_a", "doc_b"]).repartition(8)
    got = {
        r.node: r.comp for r in connected_components_star(df, max_iter=20).collect()
    }
    assert got == {i: 0 for i in range(n + 1)}


def test_pointer_jumping_raises_on_nonconvergence(spark):
    """The max_iter backstop must be loud, not a silent truncation
    that emits split clusters."""
    import pytest

    chain = [(i, i + 1) for i in range(0, 40)]
    df = spark.createDataFrame(chain, ["doc_a", "doc_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2)
