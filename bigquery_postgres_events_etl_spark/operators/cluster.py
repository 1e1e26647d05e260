"""Duplicate-cluster resolution: connected components over near-dup
pairs.

The dedup tiers (MinHash-LSH, SimHash, Jaccard) emit *pairs*; turning
pairs into deletion decisions needs the transitive closure — if A~B
and B~C, then {A,B,C} is one cluster and one canonical survivor keeps
the rest out of the training set. This is the step between "candidate
pairs" and "deduplicated corpus" in every production pipeline.

Iterative min-label propagation, driver-side loop over DataFrame
steps (the standard Spark shape for iterative graph algorithms; the
per-iteration work is one join + one aggregation, both distributed —
only the convergence counter is a scalar on the driver). Converges in
O(component diameter) rounds; near-dup clusters are shallow (dup
clusters are near-cliques), so 3-5 rounds in practice. For adversarial
long-chain graphs the alternating large-star/small-star variant
(Kiveris et al., "Connected Components in MapReduce") drops this to
O(log n) — same per-round plan shape.

Not SQL-expressible (iteration), so the registry entry is rows-only;
correctness is pinned by tests/test_cluster.py against a union-find
oracle on the same pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``, where
    component = min node id reachable through the pair graph.

    Each round: every node takes the min of its own label and its
    neighbors' labels. Labels only decrease, bounded below by the
    component min — termination is guaranteed; ``max_iter`` is a
    backstop for adversarial chains (see module docstring).
    """
    edges = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    edges = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    # localCheckpoint: iterative algorithms must truncate lineage or
    # the logical plan doubles per round (analysis-time blowup)
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # hop step: take the min of own and neighbors' labels
        nbr_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy("u")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = labels.join(nbr_min, labels.node == nbr_min.u, "left").select(
            "node",
            F.least(
                F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
            ).alias("comp"),
        )
        # pointer-jump step: comp ← label(comp). Combined with the hop
        # this converges in O(log diameter) rounds instead of
        # O(diameter) — the difference between 5 and 10^5 rounds on a
        # pathological chain.
        jumped = (
            stepped.alias("s")
            .join(
                labels.select(
                    F.col("node").alias("jnode"), F.col("comp").alias("jcomp")
                ),
                F.col("s.comp") == F.col("jnode"),
                "left",
            )
            .select(
                F.col("s.node").alias("node"),
                F.least(
                    F.col("s.comp"), F.coalesce(F.col("jcomp"), F.col("s.comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        # scalar convergence check — an aggregate, not a data collect
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels


def dup_clusters(pairs: DataFrame) -> DataFrame:
    """Cluster view over near-dup pairs: (doc_id, cluster_id,
    cluster_size, is_canonical). The canonical survivor is the min
    doc_id; dropping ``is_canonical = false`` rows from the corpus is
    the dedup deletion step."""
    cc = connected_components(pairs)
    w_size = F.count(F.lit(1)).over(Window.partitionBy("comp"))
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        w_size.cast("bigint").alias("cluster_size"),
        (F.col("node") == F.col("comp")).alias("is_canonical"),
    )
