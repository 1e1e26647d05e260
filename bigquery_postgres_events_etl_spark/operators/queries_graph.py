"""Oracle-checked graph analytics over the part co-purchase graph.

The graph family's hash-oracle tier (r9 widening): unlike PageRank
(iterative — rows-only by necessity), triangle counting and
common-neighbor link prediction are pure join/aggregate plans, so both
the Spark side and the DuckDB twin compute them from the same edge
derivation and hash-match exactly. Every compared number is an integer
count, the node id, or a SINGLE IEEE division of two exact integers
(clustering coefficient, Jaccard) — the registry's bit-exact
discipline with no decimal casting needed.

Edge derivation (shared by both entries and both engines): the
undirected part–part co-occurrence graph — two parts are adjacent iff
some order contains both (lineitem self-join on l_orderkey,
l_partkey < l_partkey dedup'd) — the classic market-basket projection
of the bipartite graph behind ``graph_pagerank_copurchase``.

Scale shape (100 TB):
- the basket self-join fans out quadratically only in BASKET size
  (TPC-H ≤ 7 lineitems/order; real carts are small constants), then
  the distinct bounds the edge list;
- triangle counting uses the degree-ordered orientation (Ortmann &
  Brandes / "compact-forward"): every edge points from the
  (degree, id)-smaller endpoint to the larger, which makes the wedge
  join's per-node fan-out O(sqrt(m)) instead of O(max_degree) — the
  standard trick that keeps join-based triangle counting feasible on
  skewed graphs. Total work O(m^1.5), all shuffles on node ids, no
  driver participation;
- common-neighbor link prediction is wedge enumeration from a BOUNDED
  query set (the top-Q hub parts), so cost is O(Q · d̄²) instead of the
  full Σ deg² wedge explosion; at cluster scale Q is the user's
  recommendation batch and the per-mid-node fan-out can additionally
  be hub-capped (documented, not needed at fixture degrees).

Reference parity: the reference pipeline (extract_bq.py) ships raw
events to Postgres and leaves graph analytics to downstream SQL; these
entries implement that downstream surface engine-side, same as the
rest of the query layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

TRI_TOP_N = 100  # triangle entry: top-N nodes by triangle count
CN_QUERIES = 20  # common-neighbor entry: top-Q hub parts as the query set
CN_TOP_K = 10  # recommendations per query part

# Shared SQL CTEs: the co-occurrence edge list and the degree table.
_EDGES_CTE = """
pairs AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a
  JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, COUNT(*) AS d
  FROM (SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs)
  GROUP BY node
)
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct part–part co-occurrence edges (u < v)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )


def _degrees(edges: DataFrame) -> DataFrame:
    """(node, d) — undirected degree from the (u < v) edge list."""
    return (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )


@register(
    "graph_triangle_count",
    f"""
    WITH {_EDGES_CTE},
    oriented AS (
      SELECT CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.u ELSE p.v END AS src,
             CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.v ELSE p.u END AS dst
      FROM pairs p
      JOIN deg du ON du.node = p.u
      JOIN deg dv ON dv.node = p.v
    ),
    tri AS (
      SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
      FROM oriented e1
      JOIN oriented e2 ON e1.dst = e2.src
      WHERE EXISTS (
        SELECT 1 FROM oriented e3 WHERE e3.src = e1.src AND e3.dst = e2.dst
      )
    ),
    node_tri AS (
      SELECT node, COUNT(*) AS triangles
      FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y AS node FROM tri
        UNION ALL SELECT z AS node FROM tri
      )
      GROUP BY node
    ),
    ranked AS (
      SELECT t.node AS part, g.d AS degree, t.triangles,
             CAST(2 * t.triangles AS DOUBLE)
               / CAST(g.d * (g.d - 1) AS DOUBLE) AS clustering,
             ROW_NUMBER() OVER (ORDER BY t.triangles DESC, t.node) AS rank
      FROM node_tri t JOIN deg g ON g.node = t.node
    )
    SELECT part, degree, triangles, clustering, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {TRI_TOP_N}
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient on the
    part co-purchase graph, top-100 by (triangles DESC, part).

    Degree-ordered orientation makes each triangle {x,y,z} match the
    wedge join exactly once (x→y, y→z wedges closed by the x→z edge),
    so per-node counts are the explode of the closed wedge frame —
    three integer columns, one hash-agg, no double counting and no /3
    correction. Clustering = 2T / d(d-1): one IEEE division of exact
    integers, bit-equal cross-engine."""
    # edges feeds deg AND the two orientation joins; oriented feeds
    # THREE consumers (both wedge sides + the closure semi-join) —
    # persist both or the lineitem self-join + distinct subtree
    # recomputes once per consumer (measured sf0.1: ~158 s unpersisted)
    edges = _copurchase_edges(spark, sf_dir).persist()
    deg = _degrees(edges).persist()
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    lower_first = F.struct(F.col("du"), F.col("u")) < F.struct(
        F.col("dv"), F.col("v")
    )
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        .persist()
    )
    # per-edge adjacency intersection, NOT a wedge join: joining
    # oriented⨝oriented on dst=src materializes Σ indeg·outdeg wedge
    # rows before the closure check (~72M at sf0.1 — measured 80+ s),
    # while intersecting collected out-neighbor arrays per edge only
    # ever materializes actual triangles (1.9M at sf0.1). The arrays
    # are outdeg-bounded = O(√m) by the orientation — the same bound
    # that caps the wedge join's fan-out, here capping memory per row.
    # For the triangle {x<y<z} (in (deg,id) order) the edge (x,y)
    # finds z in out(x) ∩ out(y): x and y each earn |ws| triangles,
    # every z in ws earns one.
    adj = oriented.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
    per_edge = (
        oriented.join(adj.select(F.col("src"), F.col("nbrs").alias("nu")), "src")
        .join(
            adj.select(F.col("src").alias("dst"), F.col("nbrs").alias("nv")),
            "dst",
        )
        .select("src", "dst", F.array_intersect("nu", "nv").alias("ws"))
        .where(F.size("ws") > 0)
        .persist()
    )
    node_tri = (
        per_edge.select(F.col("src").alias("node"), F.size("ws").alias("t"))
        .unionAll(per_edge.select(F.col("dst").alias("node"), F.size("ws").alias("t")))
        .unionAll(per_edge.select(F.explode("ws").alias("node"), F.lit(1).alias("t")))
        .groupBy("node")
        .agg(F.sum("t").alias("triangles"))
    )
    # top-N FIRST via orderBy().limit() — TakeOrderedAndProject keeps
    # the per-partition partial top-k distributed (node_tri is
    # |V|-sized; a global row_number window here would single-partition
    # the whole node set at cluster scale) — then rank only the N
    # survivors, which yields the identical global rank because limit
    # selects exactly the rank-ordered prefix.
    ranked = (
        node_tri.join(deg, "node")
        .select(
            F.col("node").alias("part"),
            F.col("d").alias("degree"),
            "triangles",
            (
                (F.lit(2) * F.col("triangles")).cast("double")
                / (F.col("d") * (F.col("d") - F.lit(1))).cast("double")
            ).alias("clustering"),
        )
        .orderBy(F.col("triangles").desc(), F.col("part"))
        .limit(TRI_TOP_N)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("triangles").desc(), F.col("part")))
            .cast("long"),
        )
    )
    return ranked


@register(
    "graph_common_neighbors",
    f"""
    WITH {_EDGES_CTE},
    und AS (
      SELECT u AS a, v AS b FROM pairs
      UNION ALL
      SELECT v AS a, u AS b FROM pairs
    ),
    qset AS (
      SELECT node AS qnode, d AS deg_q
      FROM (
        SELECT node, d, ROW_NUMBER() OVER (ORDER BY d DESC, node) AS rn
        FROM deg
      ) WHERE rn <= {CN_QUERIES}
    ),
    common AS (
      SELECT q.qnode, q.deg_q, w2.b AS candidate, COUNT(*) AS common_cnt
      FROM qset q
      JOIN und w1 ON w1.a = q.qnode
      JOIN und w2 ON w2.a = w1.b AND w2.b != q.qnode
      GROUP BY q.qnode, q.deg_q, w2.b
    ),
    nonadj AS (
      SELECT c.* FROM common c
      WHERE NOT EXISTS (
        SELECT 1 FROM und e WHERE e.a = c.qnode AND e.b = c.candidate
      )
    ),
    scored AS (
      SELECT n.qnode, n.candidate, n.common_cnt,
             n.deg_q, g.d AS deg_c,
             CAST(n.common_cnt AS DOUBLE)
               / CAST(n.deg_q + g.d - n.common_cnt AS DOUBLE) AS jaccard,
             ROW_NUMBER() OVER (PARTITION BY n.qnode
                                ORDER BY n.common_cnt DESC, n.candidate) AS rank
      FROM nonadj n JOIN deg g ON g.node = n.candidate
    )
    SELECT qnode, candidate, common_cnt, deg_q, deg_c, jaccard,
           CAST(rank AS BIGINT) AS rank
    FROM scored WHERE rank <= {CN_TOP_K}
    """,
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction ("customers who bought X's
    companions also bought …") for the top-20 hub parts:
    candidate parts NOT already co-purchased with the query part,
    ranked by shared-neighbor count with neighborhood Jaccard as the
    normalized score. Wedges fan out from the bounded query set only
    (never the Σ deg² full enumeration); the final rank is a per-query
    window over ≤ |2-hop neighborhood| candidates."""
    # und feeds three consumers (both wedge legs + the adjacency
    # anti-join), deg two (query set + candidate degrees) — persist
    # so the basket self-join runs once
    edges = _copurchase_edges(spark, sf_dir)
    und = (
        edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionAll(edges.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .persist()
    )
    deg = (
        und.groupBy(F.col("a").alias("node"))
        .agg(F.count(F.lit(1)).alias("d"))
        .persist()
    )
    # top-Q hubs via limit (TakeOrderedAndProject), not a global
    # window over the |V|-sized degree frame — see triangle entry note
    qset = (
        deg.orderBy(F.col("d").desc(), F.col("node"))
        .limit(CN_QUERIES)
        .select(F.col("node").alias("qnode"), F.col("d").alias("deg_q"))
    )
    w1 = und.select(F.col("a").alias("qnode"), F.col("b").alias("mid"))
    w2 = und.select(F.col("a").alias("mid"), F.col("b").alias("candidate"))
    common = (
        F.broadcast(qset)
        .join(w1, "qnode")
        .join(w2, "mid")
        .where(F.col("candidate") != F.col("qnode"))
        .groupBy("qnode", "deg_q", "candidate")
        .agg(F.count(F.lit(1)).alias("common_cnt"))
    )
    nonadj = common.join(
        und.select(F.col("a").alias("qnode"), F.col("b").alias("candidate")),
        ["qnode", "candidate"],
        "left_anti",
    )
    scored = (
        nonadj.join(
            deg.select(F.col("node").alias("candidate"), F.col("d").alias("deg_c")),
            "candidate",
        )
        .select(
            "qnode",
            "candidate",
            "common_cnt",
            "deg_q",
            "deg_c",
            (
                F.col("common_cnt").cast("double")
                / (F.col("deg_q") + F.col("deg_c") - F.col("common_cnt")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("qnode").orderBy(
                    F.col("common_cnt").desc(), F.col("candidate")
                )
            ),
        )
        .where(F.col("rank") <= CN_TOP_K)
        .withColumn("rank", F.col("rank").cast("long"))
    )
    return scored.select(
        "qnode", "candidate", "common_cnt", "deg_q", "deg_c", "jaccard", "rank"
    )


KCORE_K = 68  # coreness threshold: non-trivial peeling at every fixture SF
KCORE_ROUNDS = 8  # fixed peel budget; convergence ≤4 rounds at all SFs


@register(
    "graph_kcore",
    f"""
    WITH RECURSIVE
    pairs AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a
      JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    und AS (
      SELECT u AS a, v AS b FROM pairs
      UNION ALL
      SELECT v AS a, u AS b FROM pairs
    ),
    alive (r, node) AS (
      SELECT 0, a FROM und GROUP BY a
      UNION ALL
      SELECT al.r + 1, al.node
      FROM alive al
      WHERE al.r < {KCORE_ROUNDS}
        AND (SELECT COUNT(*) FROM und e
             JOIN alive x ON x.node = e.b AND x.r = al.r
             WHERE e.a = al.node) >= {KCORE_K}
    )
    SELECT e.a AS part, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM und e
    JOIN alive s ON s.r = {KCORE_ROUNDS} AND s.node = e.a
    JOIN alive t ON t.r = {KCORE_ROUNDS} AND t.node = e.b
    GROUP BY e.a
    """,
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (fixed k) of the part co-occurrence graph
    by synchronous peeling: each round removes every node whose degree
    among the surviving nodes is below k; survivors after the fixed
    round budget are the k-core, emitted with their within-core
    degree. The budget (8) exceeds measured convergence (≤4 rounds at
    every fixture SF — pinned by the pytest's fixpoint assertion), and
    a FIXED budget is what makes the iterative peel hash-oracle-able:
    the DuckDB twin replays the identical rounds as a recursive CTE
    whose working table carries (round, node) — the r8/r9
    recursive-conversion pattern extended to a REMOVAL-style loop by
    accumulating survivors per round instead of removals.

    Scale shape per round: two semi-joins of the edge list against the
    shrinking survivor set + one count aggregation — O(|E|) with the
    alive set broadcast by AQE once it shrinks; alive is referenced
    twice per round (both endpoints), so the plan doubles and must
    checkpoint every round (the pagerank dangling-branch rule)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    und = (
        edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionAll(edges.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .localCheckpoint(eager=True)
        .repartition("a")
        .persist()
    )
    alive = und.select(F.col("a").alias("node")).distinct()
    for _ in range(KCORE_ROUNDS):
        deg = (
            und.join(alive.select(F.col("node").alias("a")), "a", "leftsemi")
            .join(alive.select(F.col("node").alias("b")), "b", "leftsemi")
            .groupBy("a")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        alive = (
            deg.where(F.col("d") >= KCORE_K)
            .select(F.col("a").alias("node"))
            # lazy (r15): the plan still truncates to a LogicalRDD per
            # round (the double-reference blowup stays impossible), but
            # materialization rides the final core_deg job instead of a
            # dedicated per-round checkpoint job — measured 8 jobs → 1
            # with identical output; the twice-referenced per-round
            # state is a single RDD, so exchange reuse computes it once
            .localCheckpoint(eager=False)
        )
    core_deg = (
        und.join(alive.select(F.col("node").alias("a")), "a", "leftsemi")
        .join(alive.select(F.col("node").alias("b")), "b", "leftsemi")
        .groupBy(F.col("a").alias("part"))
        .agg(F.count(F.lit(1)).alias("core_degree"))
    )
    return core_deg


RA_SCALE = 10**12  # fixed-point units for the 1/deg resource shares


@register(
    "graph_resource_allocation",
    f"""
    WITH {_EDGES_CTE},
    und AS (
      SELECT u AS a, v AS b FROM pairs
      UNION ALL
      SELECT v AS a, u AS b FROM pairs
    ),
    qset AS (
      SELECT node AS qnode, d AS deg_q
      FROM (
        SELECT node, d, ROW_NUMBER() OVER (ORDER BY d DESC, node) AS rn
        FROM deg
      ) WHERE rn <= {CN_QUERIES}
    ),
    wedge AS (
      SELECT q.qnode, w2.b AS candidate,
             SUM({RA_SCALE} // gm.d) AS ra_fp,
             COUNT(*) AS common_cnt
      FROM qset q
      JOIN und w1 ON w1.a = q.qnode
      JOIN und w2 ON w2.a = w1.b AND w2.b != q.qnode
      JOIN deg gm ON gm.node = w1.b
      GROUP BY 1, 2
    ),
    nonadj AS (
      SELECT w.* FROM wedge w
      WHERE NOT EXISTS (
        SELECT 1 FROM und e WHERE e.a = w.qnode AND e.b = w.candidate
      )
    ),
    scored AS (
      SELECT qnode, candidate,
             CAST(ra_fp AS BIGINT) AS ra_fp,
             CAST(common_cnt AS BIGINT) AS common_cnt,
             ROW_NUMBER() OVER (PARTITION BY qnode
                                ORDER BY ra_fp DESC, candidate) AS rank
      FROM nonadj
    )
    SELECT qnode, candidate, ra_fp, common_cnt, CAST(rank AS BIGINT) AS rank
    FROM scored WHERE rank <= {CN_TOP_K}
    """,
)
def graph_resource_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-Allocation link prediction (Zhou, Lü & Zhang 2009) —
    the degree-weighted upgrade of graph_common_neighbors: each shared
    neighbor z contributes 1/deg(z), so hub intermediaries (shared
    with everyone) stop dominating the score. The share is computed in
    EXACT fixed point — ``RA_SCALE div deg(z)`` summed as BIGINT, the
    integer-division trick the Adamic-Adar log weight cannot offer —
    keeping the whole ranking hash-oracle-able (floor division is
    deterministic on both engines; a double Σ 1/deg would sum in
    nondeterministic order).

    Plan shape inherits the CN entry: wedges fan out from the bounded
    broadcast hub query set only (never Σ deg²), one extra narrow
    join against the degree sliver on the wedge midpoint, per-query
    top-k window over ≤ |2-hop| candidates."""
    edges = _copurchase_edges(spark, sf_dir)
    und = (
        edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionAll(edges.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .persist()
    )
    deg = (
        und.groupBy(F.col("a").alias("node"))
        .agg(F.count(F.lit(1)).alias("d"))
        .persist()
    )
    qset = (
        deg.orderBy(F.col("d").desc(), F.col("node"))
        .limit(CN_QUERIES)
        .select(F.col("node").alias("qnode"))
    )
    w1 = und.select(F.col("a").alias("qnode"), F.col("b").alias("mid"))
    w2 = und.select(F.col("a").alias("mid"), F.col("b").alias("candidate"))
    wedge = (
        F.broadcast(qset)
        .join(w1, "qnode")
        .join(w2, "mid")
        .where(F.col("candidate") != F.col("qnode"))
        .join(deg.select(F.col("node").alias("mid"), "d"), "mid")
        .groupBy("qnode", "candidate")
        .agg(
            F.sum(F.expr(f"{RA_SCALE} div d")).alias("ra_fp"),
            F.count(F.lit(1)).alias("common_cnt"),
        )
    )
    nonadj = wedge.join(
        und.select(F.col("a").alias("qnode"), F.col("b").alias("candidate")),
        ["qnode", "candidate"],
        "left_anti",
    )
    return (
        nonadj.select(
            "qnode",
            "candidate",
            F.col("ra_fp").cast("long").alias("ra_fp"),
            F.col("common_cnt").cast("long").alias("common_cnt"),
        )
        .withColumn(
            "rank",
            F.row_number()
            .over(
                Window.partitionBy("qnode").orderBy(
                    F.col("ra_fp").desc(), F.col("candidate")
                )
            )
            .cast("long"),
        )
        .where(F.col("rank") <= CN_TOP_K)
    )


AA_SCALE = 10**9  # fixed-point units for the 1/ln(deg) Adamic-Adar weight


@register(
    "graph_adamic_adar",
    f"""
    WITH {_EDGES_CTE},
    und AS (
      SELECT u AS a, v AS b FROM pairs
      UNION ALL
      SELECT v AS a, u AS b FROM pairs
    ),
    qset AS (
      SELECT node AS qnode FROM (
        SELECT node, d, ROW_NUMBER() OVER (ORDER BY d DESC, node) AS rn
        FROM deg
      ) WHERE rn <= {CN_QUERIES}
    ),
    wedge AS (
      SELECT q.qnode, w2.b AS candidate,
             SUM(CAST(floor({AA_SCALE} / ln(CAST(gm.d AS DOUBLE))) AS BIGINT))
               AS aa_fp,
             COUNT(*) AS common_cnt
      FROM qset q
      JOIN und w1 ON w1.a = q.qnode
      JOIN und w2 ON w2.a = w1.b AND w2.b != q.qnode
      JOIN deg gm ON gm.node = w1.b
      GROUP BY 1, 2
    ),
    nonadj AS (
      SELECT w.* FROM wedge w
      WHERE NOT EXISTS (
        SELECT 1 FROM und e WHERE e.a = w.qnode AND e.b = w.candidate
      )
    ),
    scored AS (
      SELECT qnode, candidate,
             CAST(aa_fp AS BIGINT) AS aa_fp,
             CAST(common_cnt AS BIGINT) AS common_cnt,
             ROW_NUMBER() OVER (PARTITION BY qnode
                                ORDER BY aa_fp DESC, candidate) AS rank
      FROM nonadj
    )
    SELECT qnode, candidate, aa_fp, common_cnt, CAST(rank AS BIGINT) AS rank
    FROM scored WHERE rank <= {CN_TOP_K}
    """,
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction (Adamic & Adar 2003) — completes
    the link-prediction weight family beside common-neighbors (unit
    weight) and resource-allocation (1/deg): each shared neighbor z
    contributes 1/ln(deg(z)), the classic citation/collaboration
    weighting that discounts hubs more gently than RA.

    Exactness: the RA entry's docstring noted the log weight "cannot
    offer" the integer-division trick — the BM25 precedent closes the
    gap differently: each term is FLOORED to fixed point
    (floor(10⁹ / ln(deg))) BEFORE the sum, so the aggregation is an
    order-insensitive BIGINT sum on both engines; the single ln() per
    degree value is the ≤1-ulp cross-engine surface, pushed across a
    unit boundary only when 10⁹/ln(d) sits within ~1e-7 of an integer
    (deg values are small integers — empirically parity-verified at
    all fixture scales). deg(z) ≥ 2 always (z neighbors both
    endpoints), so ln > 0.

    Plan shape is the CN/RA wedge: fan-out from the bounded broadcast
    hub query set only (never Σ deg²), narrow degree join on the
    midpoint, anti-join against existing edges, per-query top-k
    window."""
    edges = _copurchase_edges(spark, sf_dir)
    und = (
        edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionAll(edges.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .persist()
    )
    deg = (
        und.groupBy(F.col("a").alias("node"))
        .agg(F.count(F.lit(1)).alias("d"))
        .persist()
    )
    qset = (
        deg.orderBy(F.col("d").desc(), F.col("node"))
        .limit(CN_QUERIES)
        .select(F.col("node").alias("qnode"))
    )
    w1 = und.select(F.col("a").alias("qnode"), F.col("b").alias("mid"))
    w2 = und.select(F.col("a").alias("mid"), F.col("b").alias("candidate"))
    wedge = (
        F.broadcast(qset)
        .join(w1, "qnode")
        .join(w2, "mid")
        .where(F.col("candidate") != F.col("qnode"))
        .join(deg.select(F.col("node").alias("mid"), "d"), "mid")
        .groupBy("qnode", "candidate")
        .agg(
            F.sum(
                F.expr(
                    f"CAST(FLOOR({AA_SCALE} / LN(CAST(d AS DOUBLE))) AS BIGINT)"
                )
            ).alias("aa_fp"),
            F.count(F.lit(1)).alias("common_cnt"),
        )
    )
    nonadj = wedge.join(
        und.select(F.col("a").alias("qnode"), F.col("b").alias("candidate")),
        ["qnode", "candidate"],
        "left_anti",
    )
    return (
        nonadj.select(
            "qnode",
            "candidate",
            F.col("aa_fp").cast("long").alias("aa_fp"),
            F.col("common_cnt").cast("long").alias("common_cnt"),
        )
        .withColumn(
            "rank",
            F.row_number()
            .over(
                Window.partitionBy("qnode").orderBy(
                    F.col("aa_fp").desc(), F.col("candidate")
                )
            )
            .cast("long"),
        )
        .where(F.col("rank") <= CN_TOP_K)
    )


KATZ_SCALE = 10**6
KATZ_ALPHA_DEN = 1024  # α = 1/1024 — far below 1/λmax on the fixture graphs
KATZ_ROUNDS = 8


@register(
    "graph_katz_centrality",
    f"""
    WITH RECURSIVE {_EDGES_CTE},
    und AS (
      SELECT u AS a, v AS b FROM pairs
      UNION ALL
      SELECT v AS a, u AS b FROM pairs
    ),
    katz (r, node, x) AS (
      SELECT 0, node, CAST({KATZ_SCALE} AS BIGINT) FROM deg
      UNION ALL
      SELECT p.r + 1, p.node,
             COALESCE((SELECT SUM(s.x) FROM und e
                       JOIN katz s ON s.node = e.a AND s.r = p.r
                       WHERE e.b = p.node), 0) // {KATZ_ALPHA_DEN}
               + {KATZ_SCALE}
      FROM katz p WHERE p.r < {KATZ_ROUNDS}
    )
    SELECT node AS part, x AS katz_fp
    FROM katz WHERE r = {KATZ_ROUNDS}
    """,
)
def graph_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality on the part co-occurrence graph — attenuated
    walk counting (x = Σ_k α^k A^k 1), the centrality that credits a
    node for ALL walks reaching it, not just direct neighbors (the
    PageRank sibling without degree normalization). Fixed-point
    integer update x' = (Σ_nbr x) div 1024 + SCALE — α = 1/1024 keeps
    the iteration contractive (α < 1/λmax on the fixture graphs) and
    every value an exact BIGINT, so the 8 rounds replay bit-for-bit
    in the recursive-CTE oracle (the kcore/HITS correlated-aggregate
    shape; all terms positive, so floor and trunc division agree).

    Scale per round: ONE |E|-row join of the state sliver against the
    checkpointed edge frame + a partial-aggregated sum — linear in
    |E| with a constant round count; state checkpoints per round (the
    HITS quadratic-replay lesson)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    und = (
        edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionAll(edges.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .localCheckpoint(eager=True)
        .repartition("a")
        .persist()
    )
    state = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.lit(KATZ_SCALE).cast("long").alias("x"))
        .localCheckpoint(eager=True)
    )
    for _ in range(KATZ_ROUNDS):
        contrib = (
            und.join(
                state.select(F.col("node").alias("a"), F.col("x").alias("xa")),
                "a",
            )
            .groupBy(F.col("b").alias("node"))
            .agg(F.sum("xa").alias("insum"))
        )
        state = (
            state.select("node")
            .join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.expr(
                        f"coalesce(insum, 0) div {KATZ_ALPHA_DEN}"
                    )
                    + F.lit(KATZ_SCALE)
                )
                .cast("long")
                .alias("x"),
            )
            .localCheckpoint(eager=True)
        )
    return state.select(F.col("node").alias("part"), F.col("x").alias("katz_fp"))
