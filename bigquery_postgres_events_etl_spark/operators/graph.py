"""PageRank over an edge DataFrame — the canonical iterative
graph algorithm in the standard Spark shape: a driver-side loop whose
per-iteration body is one join + one aggregation, both distributed
(only loop control lives on the driver), with ``localCheckpoint``
truncating lineage each round (same discipline as
``cluster.connected_components``).

Scale shape per iteration: the edge table shuffles once on ``dst``
(contribution delivery) after a broadcast-free join with the current
rank table on ``src`` — both sides hash-partitioned on the node id, so
Catalyst reuses the partitioning across iterations. Cost is
O(|E|) per round; rank state is O(|V|). Dangling-node mass (nodes
with no out-edges) is redistributed uniformly, so total rank is
conserved at every step — the invariant the tests pin.

Not SQL-expressible (iteration), so the registry entry is rows-only;
tests/test_graph.py compares every node's rank against a pure-Python
reference and checks conservation + ordering properties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 10,
) -> DataFrame:
    """(node, rank) after ``n_iter`` power iterations.

    Ranks are doubles; per-node contribution sums run through exact
    DECIMAL(38,18) so each iteration's result is independent of
    aggregation order (the property that makes reruns and the test
    reference reproducible bit-for-bit)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # (node, outdeg) with 0 for dangling nodes; partitioned once on node
    deg = (
        nodes.join(outdeg, nodes.node == outdeg.src, "left")
        .select("node", F.coalesce("outdeg", F.lit(0)).alias("outdeg"))
        .localCheckpoint(eager=True)
    )

    ranks = deg.select("node", "outdeg", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        contribs = (
            e.join(ranks, e.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("contrib"))
            .groupBy("dst")
            .agg(
                F.sum(F.col("contrib").cast("decimal(38,18)"))
                .cast("double")
                .alias("in_mass")
            )
        )
        dangling = (
            ranks.where(F.col("outdeg") == 0)
            .agg(F.sum(F.col("rank").cast("decimal(38,18)")).cast("double").alias("m"))
            .first()["m"]
            or 0.0
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            deg.join(contribs, deg.node == contribs.dst, "left")
            .select(
                "node",
                "outdeg",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", "rank")


@register("graph_pagerank_copurchase", None)  # iterative — rows-only
def graph_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank on the bipartite customer↔part co-purchase graph
    (edges from lineitem⨝orders, both directions, so the stationary
    mass flows between popular parts and heavy buyers). Parts live at
    id 10_000_000 + partkey to share one node-id space. Rows-only
    (iteration has no single-SQL oracle); per-node parity with a
    pure-Python reference is pinned in tests/test_graph.py."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    bought = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            (F.col("l_partkey") + F.lit(10_000_000)).alias("part"),
        )
        .distinct()
    )
    edges = bought.select(
        F.col("cust").alias("src"), F.col("part").alias("dst")
    ).union(bought.select(F.col("part").alias("src"), F.col("cust").alias("dst")))
    return pagerank(edges, n_iter=8)
