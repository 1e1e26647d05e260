"""Oracle-checked similarity-search queries over ``embeddings``.

The brute-force tiers hash-match DuckDB oracles: both engines compute
the dot product as the *same sequential chain of IEEE-754 double
operations* (Spark's ``aggregate`` folds left-to-right; the oracle
spells out the left-associative 64-term sum), so results are bit-equal
with no decimal casting. The hyperplane-LSH ANN tier (r9) hash-matches
too: the hyperplanes are deterministic md5-derived ±1 vectors
(similarity._hyperplane), so the oracle inlines them as literal
coefficient chains — DuckDB recomputes the identical IEEE-754
projection fold, the same bucket id, and the same fixed-order cosine
re-rank, giving bit-equal output. The greedy MMR re-rank is
hash-checked too (r9): a recursive CTE carries each query's selected
list and replays the argmax rounds bit-exactly (_mmr_oracle_sql).
The recall REPORT converted too once both of its arms became
bit-reproducible. The only rows-only survivor in this module is the
trained-quantizer IVF entry (k-means is float-iterative; contract =
the recall test vs brute force in tests/test_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from ..schemas import EMBEDDING_DIM
from .similarity import ann_lsh_topk, brute_force_topk, cosine_near_pairs

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 is the benchmark query set
COSINE_THRESHOLD = 0.35


def _dot_sql(a: str, b: str, dim: int = EMBEDDING_DIM) -> str:
    """Left-associative sequential double sum — the exact operation
    sequence of Spark's aggregate() fold (0 + v1 is IEEE-exact)."""
    return "(" + " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)" for i in range(1, dim + 1)
    ) + ")"


_NORMS_CTE = f"""
norms AS (
  SELECT vec_id, {_dot_sql('embedding', 'embedding')} AS nsq FROM embeddings
)
"""


def _ann_bucket_sql(emb: str, num_planes: int, dim: int = EMBEDDING_DIM) -> str:
    """LSH bucket id as literal SQL: for each deterministic md5-derived
    hyperplane (similarity._hyperplane — the SAME constants Spark's
    with_lsh_bucket folds into its zip_with literal array), emit the
    left-associative projection chain CAST(emb[i] AS DOUBLE) * (±1.0)
    summed in index order — the identical IEEE operation sequence as
    Spark's aggregate() fold — then set bit p when the projection is
    strictly positive. Bit-equal chains → identical bucket ids."""
    from .similarity import _hyperplane

    bits = []
    for p in range(num_planes):
        plane = _hyperplane(p, dim)
        proj = "(" + " + ".join(
            f"CAST({emb}[{i}] AS DOUBLE) * CAST({plane[i - 1]} AS DOUBLE)"
            for i in range(1, dim + 1)
        ) + ")"
        bits.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
    return "CAST(" + " + ".join(bits) + " AS INTEGER)"


def _ann_ranked_sql(bucket_join: str, num_planes: int) -> str:
    """Shared oracle skeleton for the LSH ANN entries: bucket every
    vector once, join candidates per ``bucket_join``, exact-cosine
    re-rank with the house (cosine DESC, neighbor_id ASC) tie-break."""
    return f"""
    WITH {_NORMS_CTE},
    bucketed AS (
      SELECT e.vec_id, e.embedding, n.nsq,
             {_ann_bucket_sql('e.embedding', num_planes)} AS bucket
      FROM embeddings e JOIN norms n ON n.vec_id = e.vec_id
    ),
    q AS (SELECT * FROM bucketed WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_dot_sql('q.embedding', 'c.embedding')}
               / sqrt(q.nsq * c.nsq) AS cosine
      FROM q JOIN bucketed c
        ON {bucket_join} AND c.vec_id != q.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """


@register(
    "similarity_topk_bruteforce",
    f"""
    WITH {_NORMS_CTE},
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_dot_sql('q.embedding', 'c.embedding')}
               / sqrt(nq.nsq * nc.nsq) AS cosine
      FROM embeddings q
      JOIN embeddings c ON c.vec_id != q.vec_id
      JOIN norms nq ON nq.vec_id = q.vec_id
      JOIN norms nc ON nc.vec_id = c.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for the first 10 vectors — the ANN
    baseline. Query set broadcasts; corpus never shuffles."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    df = brute_force_topk(queries, emb, k=TOP_K)
    return df.withColumn("rank", F.col("rank").cast("long"))


@register(
    "similarity_near_pairs",
    f"""
    WITH {_NORMS_CTE}
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_dot_sql('a.embedding', 'b.embedding')}
             / sqrt(na.nsq * nb.nsq) AS cosine
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
    JOIN norms na ON na.vec_id = a.vec_id
    JOIN norms nb ON nb.vec_id = b.vec_id
    WHERE {_dot_sql('a.embedding', 'b.embedding')}
            / sqrt(na.nsq * nb.nsq) >= {COSINE_THRESHOLD}
    """,
)
def similarity_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (≥ 0.35) — the fifth
    dedup tier (SURVEY §7-M5), brute-force baseline."""
    return cosine_near_pairs(load_table(spark, sf_dir, "embeddings"), COSINE_THRESHOLD)


@register("similarity_ann_lsh", _ann_ranked_sql("c.bucket = q.bucket", num_planes=4))
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN top-k (bucketed candidates + exact re-rank).
    Deterministic md5-derived hyperplanes, so the full result is
    hash-oracle-checked (r9): the oracle inlines the same ±1 planes as
    literal chains and recomputes bucket + cosine bit-identically.
    Recall contract vs brute force stays in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    df = ann_lsh_topk(queries, emb, k=TOP_K, num_planes=4)
    return df.withColumn("rank", F.col("rank").cast("long"))


def _sign_sig_sql(emb: str, base: int, half: int = EMBEDDING_DIM // 2) -> str:
    """Packed sign-bit signature half as literal SQL: bit p set when
    dimension (base+p) is strictly positive — the identical predicate
    and bit weights as similarity.with_sign_signature's fold (32 bits
    per BIGINT half; bit 63 deliberately unused: 1<<63 overflow
    behavior differs across engines, 1<<31 in a BIGINT does not)."""
    return "(" + " + ".join(
        f"(CASE WHEN {emb}[{base + p}] > 0 THEN (CAST(1 AS BIGINT) << {p})"
        f" ELSE 0 END)"
        for p in range(half)
    ) + ")"


BQ_SHORTLIST = 50


@register(
    "similarity_binary_quantized_topk",
    f"""
    WITH {_NORMS_CTE},
    sigs AS (
      SELECT e.vec_id, e.embedding, n.nsq,
             {_sign_sig_sql('e.embedding', 1)} AS sig_lo,
             {_sign_sig_sql('e.embedding', 1 + EMBEDDING_DIM // 2)} AS sig_hi
      FROM embeddings e JOIN norms n ON n.vec_id = e.vec_id
    ),
    q AS (SELECT * FROM sigs WHERE vec_id < {N_QUERIES}),
    hammed AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             q.embedding AS q_emb, c.embedding AS c_emb,
             q.nsq AS q_nsq, c.nsq AS c_nsq,
             CAST(bit_count(xor(q.sig_lo, c.sig_lo))
                  + bit_count(xor(q.sig_hi, c.sig_hi)) AS BIGINT) AS hamming
      FROM q JOIN sigs c ON c.vec_id != q.vec_id
    ),
    short AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY hamming, neighbor_id) AS h_rank
      FROM hammed
    ),
    scored AS (
      SELECT query_id, neighbor_id, hamming,
             {_dot_sql('q_emb', 'c_emb')} / sqrt(q_nsq * c_nsq) AS cosine
      FROM short WHERE h_rank <= {BQ_SHORTLIST}
    ),
    ranked AS (
      SELECT query_id, neighbor_id, hamming, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, hamming, cosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def similarity_binary_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization ANN (the modern sign-bit tier, RaBitQ-style
    pipeline shape): 64 floats pack into two 32-bit signature words
    map-side, the Hamming stage broadcasts only 16-byte query
    signatures against the corpus scan (bit_count(xor) is codegen'd),
    and float vectors surface solely for the 50-candidate shortlist's
    exact cosine re-rank. Fully deterministic (sign predicate +
    integer Hamming + house tie-breaks) → hash oracle; recall vs
    brute force pinned in tests/test_similarity.py."""
    from .similarity import binary_quantized_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return binary_quantized_topk(
        queries, emb, k=TOP_K, shortlist=BQ_SHORTLIST, dim=EMBEDDING_DIM
    )


MRL_PREFIX_DIM = 8
MRL_SHORTLIST = 50


@register(
    "similarity_matryoshka_topk",
    f"""
    WITH {_NORMS_CTE},
    pre AS (
      SELECT e.vec_id, e.embedding, n.nsq,
             {_dot_sql('e.embedding', 'e.embedding', dim=MRL_PREFIX_DIM)}
               AS pre_nsq
      FROM embeddings e JOIN norms n ON n.vec_id = e.vec_id
    ),
    q AS (SELECT * FROM pre WHERE vec_id < {N_QUERIES}),
    coarse AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             q.embedding AS q_emb, c.embedding AS c_emb,
             q.nsq AS q_nsq, c.nsq AS c_nsq,
             {_dot_sql('q.embedding', 'c.embedding', dim=MRL_PREFIX_DIM)}
               / sqrt(q.pre_nsq * c.pre_nsq) AS pre_cosine
      FROM q JOIN pre c ON c.vec_id != q.vec_id
    ),
    short AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY pre_cosine DESC, neighbor_id)
                  AS p_rank
      FROM coarse
    ),
    scored AS (
      SELECT query_id, neighbor_id, pre_cosine,
             {_dot_sql('q_emb', 'c_emb')} / sqrt(q_nsq * c_nsq) AS cosine
      FROM short WHERE p_rank <= {MRL_SHORTLIST}
    ),
    ranked AS (
      SELECT query_id, neighbor_id, pre_cosine, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, pre_cosine, cosine,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def similarity_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (MRL) two-stage ANN: coarse cosine over the FIRST 8
    dimensions only (trained-prefix sub-embedding semantics, Kusupati
    et al. 2022), 50-candidate shortlist, exact 64-dim re-rank. The
    coarse stage moves 1/8 of the embedding bytes; the full vectors
    surface only for shortlist rows. Deterministic prefix/full chains
    + house tie-breaks → hash oracle."""
    from .similarity import matryoshka_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return matryoshka_topk(
        queries, emb, k=TOP_K, prefix_dim=MRL_PREFIX_DIM, shortlist=MRL_SHORTLIST
    )


@register("similarity_ann_ivf", None)  # trained quantizer: recall-tested
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k (k-means inverted lists + exact re-rank within
    probed lists). Rows-only driver check; recall contract vs brute
    force in tests/test_similarity.py. The frozen-codebook sibling
    below (`similarity_ivf_fixed_topk`) is the hash-checked tier."""
    from .similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return ivf_topk(queries, emb, k=TOP_K, n_lists=8, n_probe=2)


def _l2_sql(a: str, b: str, dim: int = EMBEDDING_DIM) -> str:
    """Squared-L2 as the same left-associative term chain as
    similarity._L2_TMPL's fold — bit-equal across engines."""
    return "(" + " + ".join(
        f"(CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE))"
        f" * (CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE))"
        for i in range(1, dim + 1)
    ) + ")"


IVF_FIXED_LISTS = 8
IVF_FIXED_PROBE = 2


@register(
    "similarity_ivf_fixed_topk",
    f"""
    WITH {_NORMS_CTE},
    seeds AS (
      SELECT vec_id AS list_id, embedding AS center
      FROM embeddings WHERE vec_id < {IVF_FIXED_LISTS}
    ),
    dists AS (
      SELECT c.vec_id, s.list_id,
             {_l2_sql('c.embedding', 's.center')} AS d
      FROM embeddings c, seeds s
    ),
    lists AS (
      SELECT vec_id AS neighbor_id, list_id FROM (
        SELECT vec_id, list_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d ASC, list_id ASC) AS rn
        FROM dists) t WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, list_id FROM (
        SELECT vec_id, list_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d ASC, list_id ASC) AS rn
        FROM dists WHERE vec_id < {N_QUERIES}) t
      WHERE rn <= {IVF_FIXED_PROBE}
    ),
    scored AS (
      SELECT p.query_id, l.neighbor_id, l.list_id,
             {_dot_sql('q.embedding', 'c.embedding')}
               / sqrt(nq.nsq * nc.nsq) AS cosine
      FROM probes p
      JOIN lists l ON l.list_id = p.list_id
                  AND l.neighbor_id != p.query_id
      JOIN embeddings q ON q.vec_id = p.query_id
      JOIN embeddings c ON c.vec_id = l.neighbor_id
      JOIN norms nq ON nq.vec_id = p.query_id
      JOIN norms nc ON nc.vec_id = l.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, list_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, CAST(list_id AS BIGINT) AS list_id,
           cosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def similarity_ivf_fixed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over a FROZEN codebook (the first 8 corpus vectors as
    centroids — the ship-the-quantizer production pattern): corpus
    assigns to its nearest centroid, each query probes its 2 nearest
    lists, exact cosine re-ranks the candidates. The deterministic
    codebook makes the whole pipeline a pure expression, so the IVF
    family gains a full hash-oracle tier beside the recall-tested
    trained-k-means entry; the L2 assignment distances replay in the
    oracle as the identical left-associative term chain, and ties
    break (d, list_id) on both engines. Recall vs brute force is
    additionally pytest-pinned."""
    from .similarity import ivf_fixed_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    df = ivf_fixed_topk(
        queries, emb, k=TOP_K, n_lists=IVF_FIXED_LISTS, n_probe=IVF_FIXED_PROBE
    )
    return df.withColumn("rank", F.col("rank").cast("long"))


@register(
    "similarity_ann_multiprobe",
    _ann_ranked_sql(
        "c.bucket IN (q.bucket, "
        + ", ".join(f"xor(q.bucket, {1 << p})" for p in range(5))
        + ")",
        num_planes=5,
    ),
)
def similarity_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN (own bucket + every 1-bit-flip neighbor);
    strictly higher recall than single-probe at the same plane count.
    Hash-oracle-checked (r9): probe buckets are XORs of the same
    deterministic bucket id, candidates are disjoint across probes, so
    the oracle's IN-list join reproduces the exact candidate set and
    the fixed-order re-rank is bit-equal. Recall contract in tests."""
    from .similarity import ann_lsh_topk_multiprobe

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    df = ann_lsh_topk_multiprobe(queries, emb, k=TOP_K, num_planes=5)
    return df.withColumn("rank", F.col("rank").cast("long"))


@register(
    "embedding_normalize",
    f"""
    WITH {_NORMS_CTE}
    SELECT e.vec_id,
           CAST(g.i - 1 AS BIGINT) AS dim,
           CAST(e.embedding[g.i] AS DOUBLE) / sqrt(n.nsq) AS unit_val,
           sqrt(n.nsq) AS norm
    FROM embeddings e
    JOIN norms n ON n.vec_id = e.vec_id,
         UNNEST(generate_series(1, len(e.embedding))) AS g(i)
    """,
)
def embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 normalization to unit vectors (cosine → dot preprocessing).

    The attested form posexplodes the unit vector to one (vec_id, dim,
    unit_val) row per element — array cells are unhashable in the
    row-oriented comparator; the library form (normalize_embeddings)
    keeps the array column for pipeline use."""
    from .similarity import normalize_embeddings

    unit = normalize_embeddings(load_table(spark, sf_dir, "embeddings"))
    return unit.select(
        "vec_id", F.posexplode("unit").alias("dim", "unit_val"), "norm"
    ).select("vec_id", F.col("dim").cast("long").alias("dim"), "unit_val", "norm")


@register(
    "embedding_quantize_int8",
    """
    WITH s AS (
      SELECT vec_id, embedding,
             CAST(127.0 AS DOUBLE)
               / nullif(list_max(list_transform(embedding,
                                                x -> abs(CAST(x AS DOUBLE)))),
                        0) AS scale
      FROM embeddings
    )
    SELECT vec_id,
           CAST(g.i - 1 AS BIGINT) AS dim,
           coalesce(CAST(floor(CAST(s.embedding[g.i] AS DOUBLE) * s.scale)
                         AS INTEGER), 0) AS q8_val,
           scale
    FROM s, UNNEST(generate_series(1, len(s.embedding))) AS g(i)
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization (floor, engine-exact) — the 4×
    storage cut for ANN candidate stages.  Attested form posexplodes
    q8 to one row per element (see embedding_normalize)."""
    from .similarity import quantize_embeddings_int8

    q = quantize_embeddings_int8(load_table(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id", F.posexplode("q8").alias("dim", "q8_val"), "scale"
    ).select("vec_id", F.col("dim").cast("long").alias("dim"), "q8_val", "scale")


SEMANTIC_THRESHOLD = 0.35
SEMANTIC_PLANES = 4


def _bucket_sql(dim: int = EMBEDDING_DIM, planes: int = SEMANTIC_PLANES) -> str:
    """SQL twin of similarity.with_lsh_bucket: per plane a spelled-out
    left-associative projection chain (the exact IEEE sequence of
    Spark's aggregate fold over zip_with), sign-tested into bit 2^p."""
    from .similarity import _hyperplane

    terms = []
    for p in range(planes):
        plane = _hyperplane(p, dim)
        proj = "(" + " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE) * CAST({plane[i]} AS DOUBLE)"
            for i in range(dim)
        ) + ")"
        terms.append(f"(CASE WHEN {proj} > 0 THEN {2 ** p} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


@register(
    "dedup_semantic",
    f"""
    WITH bk AS (
      SELECT vec_id, embedding,
             CAST({_bucket_sql()} AS BIGINT) AS lsh_bucket,
             {_dot_sql('embedding', 'embedding')} AS nsq
      FROM embeddings
    ),
    dups AS (
      SELECT b.vec_id, CAST(count(*) AS BIGINT) AS n_near_dups
      FROM bk a JOIN bk b
        ON a.lsh_bucket = b.lsh_bucket AND a.vec_id < b.vec_id
      WHERE {_dot_sql('a.embedding', 'b.embedding')} / sqrt(a.nsq * b.nsq)
              >= {SEMANTIC_THRESHOLD}
      GROUP BY b.vec_id
    )
    SELECT bk.vec_id, bk.lsh_bucket,
           coalesce(d.n_near_dups, 0) AS n_near_dups,
           (coalesce(d.n_near_dups, 0) = 0) AS kept
    FROM bk LEFT JOIN dups d ON d.vec_id = bk.vec_id
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style embedding dedup: deterministic hyperplane-LSH
    coarse clusters, drop any vector with a lower-id in-cluster
    neighbor at cosine ≥ 0.35. Fully oracle-checked (the hyperplanes
    and the dot-product fold are bit-identical across engines) —
    unlike the recall-tested ANN tiers, the *dedup policy* here is
    exact within its clusters."""
    from .similarity import semantic_dedup

    return semantic_dedup(
        load_table(spark, sf_dir, "embeddings"),
        threshold=SEMANTIC_THRESHOLD,
        num_planes=SEMANTIC_PLANES,
    )


@register("dedup_semantic_kmeans", None)  # iterative k-means — rows-only
def dedup_semantic_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the paper's k-means clustering (Abbas et al. 2023
    §3) — the trained-quantizer twin of ``dedup_semantic``. The
    clustering is data-dependent (Spark-ML k-means, fixed seed), so
    there is no SQL oracle; the correctness contract is the recall
    test in tests/test_text_quality.py, which pins this variant's
    recall of brute-force near-dup pairs at ≥ the LSH variant's."""
    from .similarity import semantic_dedup_kmeans

    return semantic_dedup_kmeans(
        load_table(spark, sf_dir, "embeddings"),
        threshold=SEMANTIC_THRESHOLD,
        n_clusters=16,
    )


SEMANTIC_FROZEN_LISTS = 8


@register(
    "dedup_semantic_frozen",
    f"""
    WITH seeds AS (
      SELECT vec_id AS list_id, embedding AS center
      FROM embeddings WHERE vec_id < {SEMANTIC_FROZEN_LISTS}
    ),
    dists AS (
      SELECT c.vec_id, s.list_id,
             {_l2_sql('c.embedding', 's.center')} AS d
      FROM embeddings c, seeds s
    ),
    assigned AS (
      SELECT e.vec_id, t.list_id AS cluster_id, e.embedding,
             {_dot_sql('e.embedding', 'e.embedding')} AS nsq
      FROM (
        SELECT vec_id, list_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d ASC, list_id ASC) AS rn
        FROM dists
      ) t
      JOIN embeddings e ON e.vec_id = t.vec_id
      WHERE t.rn = 1
    ),
    dups AS (
      SELECT b.vec_id, CAST(count(*) AS BIGINT) AS n_near_dups
      FROM assigned a JOIN assigned b
        ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
      WHERE {_dot_sql('a.embedding', 'b.embedding')} / sqrt(a.nsq * b.nsq)
              >= {SEMANTIC_THRESHOLD}
      GROUP BY b.vec_id
    )
    SELECT s.vec_id, CAST(s.cluster_id AS BIGINT) AS cluster_id,
           coalesce(d.n_near_dups, 0) AS n_near_dups,
           (coalesce(d.n_near_dups, 0) = 0) AS kept
    FROM assigned s LEFT JOIN dups d ON d.vec_id = s.vec_id
    """,
)
def dedup_semantic_frozen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the FROZEN-codebook quantizer (first 8 corpus
    vectors as shipped centroids) — the hash-oracle tier beside the
    recall-tested k-means entry, completing for the dedup family what
    `similarity_ivf_fixed_topk` did for ANN. The L2 assignment
    distances replay in the oracle as the identical left-associative
    term chains, ties break (d, list_id) on both engines, and the
    in-cluster cosine-threshold drop policy is then hash-checked
    end-to-end (the trained tier keeps owning recall).

    Degenerate-input asymmetry (deliberate, ADVICE r12): on a corpus
    whose ids 0..k-1 are not all present the Spark side FAILS LOUDLY
    (ValueError in semantic_dedup_frozen) while the oracle SQL would
    silently shrink the codebook and return rows — a sparse-id
    fixture erroring on one engine is this guard working, not an
    oracle regression."""
    from .similarity import semantic_dedup_frozen

    return semantic_dedup_frozen(
        load_table(spark, sf_dir, "embeddings"),
        threshold=SEMANTIC_THRESHOLD,
        n_lists=SEMANTIC_FROZEN_LISTS,
    )


# production regime: the codebook grows WITH the corpus so cluster
# populations stay ~constant and the in-cluster pair join stays linear
# (SCALE.md's measured fixed-cluster-size curve: 3.3x @10x vs the
# frozen-8 entry's deliberately adversarial 18.3x)
SEMANTIC_TARGET_CLUSTER = 64


@register(
    "dedup_semantic_fixed_size",
    f"""
    WITH k AS (
      SELECT CAST((COUNT(*) + {SEMANTIC_TARGET_CLUSTER - 1})
                  // {SEMANTIC_TARGET_CLUSTER} AS BIGINT) AS k
      FROM embeddings
    ),
    seeds AS (
      SELECT vec_id AS list_id, embedding AS center
      FROM embeddings WHERE vec_id < (SELECT k FROM k)
    ),
    dists AS (
      SELECT c.vec_id, s.list_id,
             {_l2_sql('c.embedding', 's.center')} AS d
      FROM embeddings c, seeds s
    ),
    assigned AS (
      SELECT e.vec_id, t.list_id AS cluster_id, e.embedding,
             {_dot_sql('e.embedding', 'e.embedding')} AS nsq
      FROM (
        SELECT vec_id, list_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d ASC, list_id ASC) AS rn
        FROM dists
      ) t
      JOIN embeddings e ON e.vec_id = t.vec_id
      WHERE t.rn = 1
    ),
    dups AS (
      SELECT b.vec_id, CAST(count(*) AS BIGINT) AS n_near_dups
      FROM assigned a JOIN assigned b
        ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
      WHERE {_dot_sql('a.embedding', 'b.embedding')} / sqrt(a.nsq * b.nsq)
              >= {SEMANTIC_THRESHOLD}
      GROUP BY b.vec_id
    )
    SELECT s.vec_id, CAST(s.cluster_id AS BIGINT) AS cluster_id,
           coalesce(d.n_near_dups, 0) AS n_near_dups,
           (coalesce(d.n_near_dups, 0) = 0) AS kept
    FROM assigned s LEFT JOIN dups d ON d.vec_id = s.vec_id
    """,
)
def dedup_semantic_fixed_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup at the PRODUCTION codebook-sizing regime (r11 verdict
    item 7): the frozen-codebook tier with k = ceil(N / 64) lists, so
    cluster populations stay ~64 as the corpus grows and the
    in-cluster pair join stays LINEAR in N — the scale-safe shipped
    default beside `dedup_semantic_frozen`'s deliberately adversarial
    fixed-8 point (18.3x @10x measured; this regime measured 3.3x).
    Same quantizer contract (first k corpus vectors as centroids),
    same (d, list_id) tie-break, same drop policy — only the sizing
    rule differs, and it is itself part of the hash-checked semantics
    (k derives from COUNT(*) on both engines).

    Degenerate-input asymmetry (deliberate, ADVICE r12): an EMPTY
    embeddings table clamps k to max(k,1)=1 here, and ids 0..k-1
    missing raises ValueError on the Spark side while the oracle
    silently shrinks the codebook — fail-loud hardening, not an
    oracle regression, if a sparse-id fixture ever diverges."""
    from .similarity import semantic_dedup_frozen

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()  # bounded scalar: sizes the codebook, like the oracle's k CTE
    k = (n + SEMANTIC_TARGET_CLUSTER - 1) // SEMANTIC_TARGET_CLUSTER
    return semantic_dedup_frozen(
        emb, threshold=SEMANTIC_THRESHOLD, n_lists=max(k, 1)
    )


RP_DIMS = 8


def _rp_sql(dims: int = RP_DIMS, dim: int = EMBEDDING_DIM) -> str:
    """One SELECT per output dim unioned via UNNEST-free VALUES-less
    form: each value is the same left-associative projection chain the
    Spark fold performs."""
    from .similarity import _hyperplane

    parts = []
    for k in range(dims):
        plane = _hyperplane(k, dim)
        chain = " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE) * CAST({plane[i]} AS DOUBLE)"
            for i in range(dim)
        )
        parts.append(
            f"SELECT vec_id, {k} AS dim, ({chain}) AS value FROM embeddings"
        )
    return " UNION ALL ".join(parts)


@register(
    "embedding_random_projection",
    f"SELECT vec_id, CAST(dim AS INTEGER) AS dim, value FROM ({_rp_sql()})",
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random projection to 8 dims (deterministic ±1 hyperplanes,
    map-side folds, posexploded rows) — hash-checked per coordinate
    against the oracle's identical left-associative chains."""
    from .similarity import random_projection

    return random_projection(
        load_table(spark, sf_dir, "embeddings"), out_dims=RP_DIMS
    ).withColumn("dim", F.col("dim").cast("int"))


HYBRID_MAX_DF = 10


@register(
    "similarity_hybrid_topk",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh0 AS (
      SELECT doc_id,
             unnest(CASE WHEN len(t) >= 3
                         THEN list_transform(generate_series(1, len(t) - 2),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                         ELSE [] END) AS term_s
      FROM toks
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             ('0x' || substr(md5(term_s), 1, 15))::BIGINT AS term
      FROM sh0
    ),
    dfc AS (SELECT term, count(*) AS df FROM sh GROUP BY term),
    rare AS (SELECT term FROM dfc WHERE df <= {HYBRID_MAX_DF}),
    rtok AS (SELECT s.doc_id, s.term FROM sh s JOIN rare r ON s.term = r.term),
    cand AS (
      SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
             count(*) AS n_shared
      FROM rtok q JOIN rtok c ON q.term = c.term AND q.doc_id != c.doc_id
      WHERE q.doc_id < {N_QUERIES}
      GROUP BY 1, 2
    ),
    {_NORMS_CTE.strip().lstrip()},
    scored AS (
      SELECT cand.query_id, cand.neighbor_id, cand.n_shared,
             {_dot_sql('qe.embedding', 'ce.embedding')}
               / sqrt(nq.nsq * nc.nsq) AS cosine
      FROM cand
      JOIN embeddings qe ON qe.vec_id = cand.query_id
      JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
      JOIN norms nq ON nq.vec_id = cand.query_id
      JOIN norms nc ON nc.vec_id = cand.neighbor_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id,
           CAST(n_shared AS BIGINT) AS n_shared_rare_terms,
           cosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def similarity_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage hybrid retrieval: rare-shingle inverted-index
    candidates (df-capped posting lists — the hot-key valve) re-ranked
    by exact embedding cosine; the sparse-recall/dense-precision
    composition every production retrieval stack runs."""
    from .similarity import hybrid_topk

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return hybrid_topk(docs, emb, k=TOP_K, n_queries=N_QUERIES, max_df=HYBRID_MAX_DF)


@register(
    "similarity_mutual_knn",
    f"""
    WITH {_NORMS_CTE},
    scored AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             {_dot_sql('a.embedding', 'b.embedding')}
               / sqrt(na.nsq * nb.nsq) AS cosine
      FROM embeddings a
      JOIN embeddings b ON a.vec_id != b.vec_id
      JOIN norms na ON na.vec_id = a.vec_id
      JOIN norms nb ON nb.vec_id = b.vec_id
    ),
    edges AS (
      SELECT src, dst, cosine,
             ROW_NUMBER() OVER (PARTITION BY src
                                ORDER BY cosine DESC, dst) AS rank
      FROM scored
      QUALIFY rank <= {TOP_K}
    )
    SELECT f.src AS vec_id_a, f.dst AS vec_id_b, f.cosine,
           CAST(f.rank AS BIGINT) AS rank_ab,
           CAST(r.rank AS BIGINT) AS rank_ba
    FROM edges f
    JOIN edges r ON r.src = f.dst AND r.dst = f.src
    WHERE f.src < f.dst
    """,
)
def similarity_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual k-NN graph (k = 5): undirected edges kept only when the
    top-k relation holds in BOTH directions — the hub-pruning
    symmetric filter for semantic-pair mining and graph-based dedup.
    Exact verify tier (all-pairs cosine + per-source ranking window);
    see operators.similarity.mutual_knn_graph for the LSH-bucketed
    composition at corpus scale."""
    from .similarity import mutual_knn_graph

    df = mutual_knn_graph(load_table(spark, sf_dir, "embeddings"), k=TOP_K)
    return df.select(
        "vec_id_a",
        "vec_id_b",
        "cosine",
        F.col("rank_ab").cast("long").alias("rank_ab"),
        F.col("rank_ba").cast("long").alias("rank_ba"),
    )


def _mmr_oracle_sql(
    k: int = 5, n_candidates: int = 20, n_queries: int = 4, lam: float = 0.7
) -> str:
    """Recursive-CTE twin of the greedy MMR loop (r9 conversion —
    the same move that converted the connected-components family in
    r8): the greedy argmax is a fixpoint over a BOUNDED candidate
    frame, so a recursive CTE that carries each query's selected list
    and re-ranks the remainder per round recomputes it exactly.

    Bit-parity argument: candidate cosines and candidate-candidate
    sims are the house left-associative IEEE chains (bit-equal
    cross-engine, as in the brute-force entries); the MMR score is
    λ·rel − (1−λ)·max_sel_sim with the λ constants rendered via
    Python repr so both engines parse the IDENTICAL doubles
    (1−0.7 = 0.30000000000000004 — writing 0.3 would diverge);
    identical doubles ⇒ identical argmax, ties broken (score DESC,
    id ASC) on both sides. The seed round's score subtracts
    (1−λ)·0.0, which is IEEE-exact x − 0.0 = x, matching Spark's
    coalesced empty-selection penalty. DuckDB-1.0 shape constraints
    honored: the recursive reference appears ONCE, argmax runs as a
    ROW_NUMBER window in a derived subquery, the selected-set max is
    a LATERAL over the static pair_sim CTE (probed working)."""
    lam_r, one_minus_lam_r = repr(lam), repr(1.0 - lam)
    return f"""
    WITH RECURSIVE {_NORMS_CTE},
    cands AS (
      SELECT query_id, cand, cosine FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS cand,
               {_dot_sql('q.embedding', 'c.embedding')}
                 / sqrt(nq.nsq * nc.nsq) AS cosine,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_dot_sql('q.embedding', 'c.embedding')}
                            / sqrt(nq.nsq * nc.nsq) DESC, c.vec_id) AS rnk
        FROM embeddings q
        JOIN embeddings c ON c.vec_id != q.vec_id
        JOIN norms nq ON nq.vec_id = q.vec_id
        JOIN norms nc ON nc.vec_id = c.vec_id
        WHERE q.vec_id < {n_queries}
      ) WHERE rnk <= {n_candidates}
    ),
    pair_sim AS (
      SELECT a.query_id, a.cand AS da, b.cand AS db,
             {_dot_sql('ea.embedding', 'eb.embedding')}
               / sqrt(na.nsq * nb.nsq) AS sim
      FROM cands a
      JOIN cands b ON a.query_id = b.query_id AND a.cand != b.cand
      JOIN embeddings ea ON ea.vec_id = a.cand
      JOIN embeddings eb ON eb.vec_id = b.cand
      JOIN norms na ON na.vec_id = a.cand
      JOIN norms nb ON nb.vec_id = b.cand
    ),
    picks AS (
      SELECT it, query_id, sel, pick, score FROM (
        SELECT 1 AS it, query_id, [cand] AS sel, cand AS pick,
               {lam_r} * cosine - {one_minus_lam_r} * 0.0 AS score,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY {lam_r} * cosine - {one_minus_lam_r} * 0.0 DESC,
                          cand) AS rn
        FROM cands
      ) WHERE rn = 1
      UNION ALL
      SELECT it, query_id, sel, pick, score FROM (
        SELECT p.it + 1 AS it, c.query_id,
               list_append(p.sel, c.cand) AS sel, c.cand AS pick,
               {lam_r} * c.cosine
                 - {one_minus_lam_r} * coalesce(mx.m, 0.0) AS score,
               ROW_NUMBER() OVER (PARTITION BY c.query_id
                 ORDER BY {lam_r} * c.cosine
                            - {one_minus_lam_r} * coalesce(mx.m, 0.0) DESC,
                          c.cand) AS rn
        FROM picks p
        JOIN cands c ON c.query_id = p.query_id
                    AND NOT list_contains(p.sel, c.cand)
        LEFT JOIN LATERAL (
          SELECT max(ps.sim) AS m FROM pair_sim ps
          WHERE ps.query_id = c.query_id AND ps.da = c.cand
            AND list_contains(p.sel, ps.db)
        ) mx ON true
        WHERE p.it < {k}
      ) WHERE rn = 1
    )
    SELECT query_id, pick AS neighbor_id, score AS mmr_score,
           CAST(it AS BIGINT) AS pick_rank
    FROM picks
    """


@register("similarity_mmr_topk", _mmr_oracle_sql())
def similarity_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-5 for the first 4 query vectors (λ = 0.7,
    20 brute-force candidates): the RAG re-rank stage that stops
    near-duplicate passages crowding a result list. Hash-oracle-
    checked since r9 (recursive-CTE greedy twin — see
    _mmr_oracle_sql's bit-parity argument); tests/test_similarity.py
    still pins per-pick parity with a pure-Python MMR and the
    diversity property."""
    from .similarity import mmr_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 4)
    return mmr_topk(queries, emb, k=5, n_candidates=20)


@register(
    "embedding_label_centroids",
    f"""
    WITH dims AS (
      SELECT label, unnest(generate_series(1, {EMBEDDING_DIM})) AS dim,
             embedding, vec_id
      FROM embeddings
    ),
    cells AS (
      SELECT label, dim,
             list(CAST(embedding[dim] AS DOUBLE) ORDER BY vec_id) AS vals
      FROM dims GROUP BY label, dim
    )
    SELECT label, CAST(dim AS INT) AS dim,
           list_reduce(list_prepend(CAST(0 AS DOUBLE), vals),
                       (acc, x) -> acc + x) / len(vals) AS centroid
    FROM cells
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (class prototypes — the nearest-
    centroid classifier / prototype-network primitive, and the same
    aggregation a k-means assignment step runs). Parity note: float
    cell values are binary fractions whose exact decimal expansions
    end in ...5, so the decimal-rounding trick TIES at the rounding
    digit (observed: 1 cell in 4000 differed between Spark HALF_UP
    and DuckDB half-even) — instead both engines fold the cells in
    the SAME vec_id-ordered left-associative double chain (the dot-
    product discipline), bit-exact with no rounding step. Plan: one
    (label, dim) shuffle of scalar slivers; the ordered fold is per
    cell over |label members| values. At production scale swap the
    collected fold for the decimal partial-agg sum (order-free) —
    the fold here exists for cross-engine bit-parity, the decimal
    twin for unbounded groups; same shuffle either way."""
    emb = load_table(spark, sf_dir, "embeddings")
    cells = (
        emb.select(
            "label", "vec_id", F.posexplode("embedding").alias("dim0", "val")
        )
        .groupBy("label", (F.col("dim0") + 1).cast("int").alias("dim"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("vec_id", F.col("val").cast("double").alias("v")))
            ).alias("vals")
        )
    )
    return cells.select(
        "label",
        "dim",
        F.expr(
            "aggregate(vals, CAST(0 AS DOUBLE), (acc, s) -> acc + s.v)"
            " / size(vals)"
        ).alias("centroid"),
    )


@register(
    "similarity_centroid_assign",
    f"""
    WITH dims AS (
      SELECT label, unnest(generate_series(1, {EMBEDDING_DIM})) AS dim,
             embedding, vec_id
      FROM embeddings
    ),
    cells AS (
      SELECT label, dim,
             list(CAST(embedding[dim] AS DOUBLE) ORDER BY vec_id) AS vals
      FROM dims GROUP BY label, dim
    ),
    cents AS (
      SELECT label, dim,
             list_reduce(list_prepend(CAST(0 AS DOUBLE), vals),
                         (acc, x) -> acc + x) / len(vals) AS centroid
      FROM cells
    ),
    pts AS (
      SELECT vec_id, label AS true_label,
             unnest(generate_series(1, {EMBEDDING_DIM})) AS dim, embedding
      FROM embeddings
    ),
    terms AS (
      SELECT p.vec_id, p.true_label, c.label,
             CAST(FLOOR((CAST(p.embedding[p.dim] AS DOUBLE) - c.centroid)
                        * (CAST(p.embedding[p.dim] AS DOUBLE) - c.centroid)
                        * CAST(1e9 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                  AS DECIMAL(18,0)) AS t
      FROM pts p JOIN cents c ON c.dim = p.dim
    ),
    dists AS (
      SELECT vec_id, true_label, label, SUM(t) AS dist_dec
      FROM terms GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY dist_dec, label) AS rn
      FROM dists
    )
    SELECT vec_id, label AS assigned_label, true_label,
           CAST(dist_dec AS DOUBLE) / CAST(1e9 AS DOUBLE) AS dist_sq,
           (label = true_label) AS correct
    FROM ranked WHERE rn = 1
    """,
)
def similarity_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classification: every vector assigned to the
    closest class prototype by squared L2 — the inference half of the
    prototype classifier whose training half is
    ``embedding_label_centroids`` (also the assignment step of a
    k-means iteration, and the standard probe for embedding quality:
    the `correct` flag gives leave-nothing-out centroid accuracy).

    Parity: centroids reuse the centroids entry's bit-exact ordered
    fold; each squared-difference term is a deterministic IEEE chain
    scaled to an exact integer via floor(x*1e9 + 0.5) — the house
    idiom registry.py mandates for rounding computed doubles into
    order-free decimal sums (a direct double→DECIMAL CAST is
    engine-divergent near rounding boundaries: Spark converts via
    BigDecimal of the exact binary value while DuckDB scales in
    floats — the r5/logrank lesson). Distances fold in exact integer
    decimal (order-free), so the argmin (ordered by exact decimal,
    then label) cannot flip between engines, and the reported
    dist_sq is one final IEEE division identical on both sides.

    Scale: the centroid table is |labels| × dim rows — bounded by the
    label vocabulary, broadcast; the per-(vec, label) distance agg is
    partial-aggregated map-side (dim terms collapse before the
    exchange), and the argmin window is partitioned by vec_id."""
    emb = load_table(spark, sf_dir, "embeddings")
    cells = (
        emb.select(
            "label", "vec_id", F.posexplode("embedding").alias("dim0", "val")
        )
        .groupBy("label", (F.col("dim0") + 1).cast("int").alias("dim"))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("vec_id", F.col("val").cast("double").alias("v"))
                )
            ).alias("vals")
        )
    )
    cents = cells.select(
        F.col("label").alias("c_label"),
        "dim",
        F.expr(
            "aggregate(vals, CAST(0 AS DOUBLE), (acc, s) -> acc + s.v)"
            " / size(vals)"
        ).alias("centroid"),
    )
    pts = emb.select(
        "vec_id",
        F.col("label").alias("true_label"),
        F.posexplode("embedding").alias("dim0", "val"),
    ).select(
        "vec_id",
        "true_label",
        (F.col("dim0") + 1).cast("int").alias("dim"),
        F.col("val").cast("double").alias("val"),
    )
    # floor(x·1e9+0.5): explicit IEEE-chain scaling instead of an
    # engine-divergent double→decimal CAST (see docstring / registry.py).
    # Spark's floor(double) yields LONG, so the honest term domain is
    # |diff|²·1e9 < 2^63 (|diff| ≲ 3.0e3 — embeddings are unit-scale);
    # DECIMAL(18,0) declares that bound on BOTH engines, so an
    # out-of-range value fails loudly and identically (ANSI overflow)
    # instead of silently diverging past the long range.
    term = F.floor(
        (F.col("val") - F.col("centroid"))
        * (F.col("val") - F.col("centroid"))
        * F.lit(1e9).cast("double")
        + F.lit(0.5).cast("double")
    ).cast("decimal(18,0)")
    dists = (
        pts.join(F.broadcast(cents), "dim")
        .groupBy("vec_id", "true_label", F.col("c_label").alias("label"))
        .agg(F.sum(term).alias("dist_dec"))
    )
    w = Window.partitionBy("vec_id").orderBy("dist_dec", "label")
    return (
        dists.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("label").alias("assigned_label"),
            "true_label",
            (
                F.col("dist_dec").cast("double")
                / F.lit(1e9).cast("double")
            ).alias("dist_sq"),
            (F.col("label") == F.col("true_label")).alias("correct"),
        )
    )


@register(
    "similarity_hard_negatives",
    f"""
    WITH {_NORMS_CTE},
    scored AS (
      SELECT q.vec_id AS query_id, q.label AS query_label,
             c.vec_id AS negative_id, c.label AS negative_label,
             {_dot_sql('q.embedding', 'c.embedding')}
               / sqrt(nq.nsq * nc.nsq) AS cosine
      FROM embeddings q
      JOIN embeddings c ON c.vec_id != q.vec_id AND c.label != q.label
      JOIN norms nq ON nq.vec_id = q.vec_id
      JOIN norms nc ON nc.vec_id = c.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ),
    ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, negative_id
      ) AS BIGINT) AS rank
      FROM scored
    )
    SELECT query_id, query_label, negative_id, negative_label, cosine, rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def similarity_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: each query's
    top-5 most-similar vectors with a DIFFERENT label — the negatives
    that actually move an embedding model (random negatives are
    trivially separable). Same broadcast-query / corpus-never-
    shuffles plan as the brute-force tier plus a label filter pushed
    into the join; swap in the ANN tier for candidate generation at
    scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    from pyspark.sql import Window

    from .similarity import cosine, dot, with_norm_sq

    q = with_norm_sq(emb.where(F.col("vec_id") < N_QUERIES)).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("q_emb"),
        F.col("norm_sq").alias("q_norm"),
    )
    c = with_norm_sq(emb).select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("negative_label"),
        F.col("embedding").alias("c_emb"),
        F.col("norm_sq").alias("c_norm"),
    )
    pairs = c.join(
        F.broadcast(q),
        (F.col("negative_id") != F.col("query_id"))
        & (F.col("negative_label") != F.col("query_label")),
    )
    scored = pairs.withColumn(
        "cosine", cosine(dot("q_emb", "c_emb"), F.col("q_norm"), F.col("c_norm"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("negative_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= TOP_K)
        .select(
            "query_id", "query_label", "negative_id", "negative_label", "cosine", "rank"
        )
    )


@register(
    "pipeline_negative_sampling",
    f"""
    WITH cands AS (
      SELECT q.vec_id AS query_id, c.vec_id AS negative_id,
             ('0x' || substr(md5('17:' || CAST(q.vec_id AS VARCHAR) || ':'
                              || CAST(c.vec_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM embeddings q JOIN embeddings c
        ON c.vec_id != q.vec_id AND c.label != q.label
      WHERE q.vec_id < {N_QUERIES}
    ),
    ranked AS (
      SELECT query_id, negative_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY h, negative_id
             ) AS BIGINT) AS draw
      FROM cands
    )
    SELECT query_id, negative_id, draw FROM ranked WHERE draw <= 5
    """,
)
def pipeline_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform random negative sampling for contrastive training, the
    complement of hard-negative mining: 5 different-label negatives
    per query drawn in deterministic md5 order (reproducible across
    runs, engines, and retries — rand() is none of those). The hash
    ranks the candidate set; at scale the candidate join is replaced
    by per-shard sampling, same draw rule."""
    emb = load_table(spark, sf_dir, "embeddings")
    from pyspark.sql import Window

    from .dedup import md5_hash60

    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    )
    c = emb.select(
        F.col("vec_id").alias("negative_id"), F.col("label").alias("clabel")
    )
    cands = c.join(
        F.broadcast(q),
        (F.col("negative_id") != F.col("query_id"))
        & (F.col("clabel") != F.col("qlabel")),
    ).select(
        "query_id",
        "negative_id",
        md5_hash60(
            F.concat_ws(
                ":",
                F.lit("17"),
                F.col("query_id").cast("string"),
                F.col("negative_id").cast("string"),
            )
        ).alias("h"),
    )
    w = Window.partitionBy("query_id").orderBy("h", "negative_id")
    return (
        cands.withColumn("draw", F.row_number().over(w).cast("bigint"))
        .where(F.col("draw") <= 5)
        .select("query_id", "negative_id", "draw")
    )


def _rrf_oracle() -> str:
    from .queries_text import _BM25_TERMS, _bm25_contrib

    tf_cols = ", ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ", ".join(
        f"count(*) FILTER (WHERE tf{i} > 0) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    contribs = " + ".join(_bm25_contrib(i) for i in range(len(_BM25_TERMS)))
    return f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, {tf_cols} FROM t),
    s AS (
      SELECT count(*) AS n_docs,
             CAST(SUM(CAST(dl AS DECIMAL(27,0))) AS DOUBLE) / count(*) AS avgdl,
             {df_cols}
      FROM d
    ),
    bm AS (SELECT doc_id, CAST({contribs} AS DOUBLE) AS bm25 FROM d, s),
    lex AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS lex_rank
      FROM bm QUALIFY lex_rank <= 20
    ),
    {_NORMS_CTE.strip()},
    dsc AS (
      SELECT c.vec_id AS doc_id,
             {_dot_sql('q.embedding', 'c.embedding')} / sqrt(nq.nsq * nc.nsq) AS cosine
      FROM embeddings q
      JOIN embeddings c ON c.vec_id != q.vec_id
      JOIN norms nq ON nq.vec_id = q.vec_id
      JOIN norms nc ON nc.vec_id = c.vec_id
      WHERE q.vec_id = 0
    ),
    dense AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS BIGINT) AS dense_rank
      FROM dsc QUALIFY dense_rank <= 20
    )
    SELECT COALESCE(l.doc_id, dn.doc_id) AS doc_id, l.lex_rank, dn.dense_rank,
           COALESCE(CAST(1.0 AS DOUBLE) / CAST(60 + l.lex_rank AS DOUBLE), CAST(0 AS DOUBLE))
             + COALESCE(CAST(1.0 AS DOUBLE) / CAST(60 + dn.dense_rank AS DOUBLE), CAST(0 AS DOUBLE))
             AS rrf_score
    FROM lex l FULL OUTER JOIN dense dn ON l.doc_id = dn.doc_id
    ORDER BY rrf_score DESC, doc_id LIMIT 10
    """


@register("similarity_rrf_fusion", _rrf_oracle())
def similarity_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the BM25 top-20 and the cosine
    top-20 (Σ 1/(60+rank) — the Elasticsearch/Vespa hybrid-search
    combiner): rank windows ride constant-k lists, the corpus-sized
    work stays inside the two retrievers, and the fused score is a
    fixed two-term IEEE chain (no decimal rounding needed)."""
    from ..io import parallelize
    from .queries_text import _BM25_TERMS
    from .similarity import rrf_fusion

    docs = parallelize(load_table(spark, sf_dir, "documents"))
    emb = load_table(spark, sf_dir, "embeddings")
    return rrf_fusion(docs, emb, _BM25_TERMS)


def _pq_values_sql() -> str:
    """The md5-derived PQ codebook as a VALUES list — the SAME floats
    Spark folds into its subspace-distance expressions (all k/64 exact
    binary fractions, so repr() renders them losslessly)."""
    from .similarity import PQ_K, PQ_M, _pq_centroid

    rows = []
    for m in range(PQ_M):
        for c in range(PQ_K):
            cols = ", ".join(
                f"CAST({v!r} AS DOUBLE)" for v in _pq_centroid(m, c)
            )
            rows.append(f"({m}, {c}, {cols})")
    return ",\n      ".join(rows)


def _pq_dist_sql(emb: str) -> str:
    """Left-associative Σ_j (CAST(emb[m·8+j] AS DOUBLE) − c_j)² with
    the subspace index m and centroid components c1..c8 taken from the
    joined centroids row — the identical IEEE chain as
    similarity._pq_dist."""
    from .similarity import PQ_DSUB

    terms = []
    for j in range(1, PQ_DSUB + 1):
        x = f"(CAST({emb}[c.m * {PQ_DSUB} + {j}] AS DOUBLE) - c.c{j})"
        terms.append(f"{x} * {x}")
    return "(" + " + ".join(terms) + ")"


def _pq_oracle_sql() -> str:
    from .similarity import PQ_M

    code_cols = ",\n             ".join(
        f"MAX(CASE WHEN m = {m} THEN code END) AS code_{m}"
        for m in range(PQ_M)
    )
    adc_joins = "\n      ".join(
        f"JOIN qd qd{m} ON qd{m}.m = {m} AND qd{m}.cidx = p.code_{m}"
        + (
            f" AND qd{m}.vec_id = qd0.vec_id"
            if m
            else " AND qd0.vec_id != p.vec_id"
        )
        for m in range(PQ_M)
    )
    adc_chain = " + ".join(f"qd{m}.dist" for m in range(PQ_M))
    return f"""
    WITH centroids (m, cidx, c1, c2, c3, c4, c5, c6, c7, c8) AS (
      VALUES {_pq_values_sql()}
    ),
    enc AS (
      SELECT e.vec_id, c.m, c.cidx, {_pq_dist_sql('e.embedding')} AS dist
      FROM embeddings e CROSS JOIN centroids c
    ),
    codes AS (
      SELECT vec_id, m, cidx AS code FROM (
        SELECT vec_id, m, cidx,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY dist, cidx) AS rn
        FROM enc
      ) WHERE rn = 1
    ),
    codes_p AS (
      SELECT vec_id, {code_cols}
      FROM codes GROUP BY vec_id
    ),
    qd AS (
      SELECT q.vec_id, c.m, c.cidx, {_pq_dist_sql('q.embedding')} AS dist
      FROM embeddings q CROSS JOIN centroids c
      WHERE q.vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT qd0.vec_id AS query_id, p.vec_id AS neighbor_id,
             {adc_chain} AS adc
      FROM codes_p p
      {adc_joins}
    ),
    ranked AS (
      SELECT query_id, neighbor_id, adc,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adc, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, adc, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """


@register("similarity_pq_adc", _pq_oracle_sql())
def similarity_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation:
    corpus vectors compress map-side to 8×4-bit codes against a
    deterministic md5-derived codebook; queries keep exact vectors and
    score candidates by per-subspace distance-table lookups
    (Jégou et al., "Product Quantization for Nearest Neighbor
    Search"). Full hash oracle: the codebook floats are exact binary
    fractions inlined as VALUES, both engines run the identical IEEE
    chains for subspace distances, argmin codes (ties → lowest index)
    and the 8-term ADC sum — bit-equal output. The ADC-vs-exact
    ordering contract is pinned in tests/test_similarity.py."""
    from .similarity import pq_adc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    df = pq_adc_topk(queries, emb, k=TOP_K)
    return df.withColumn("rank", F.col("rank").cast("long"))


_RECALL_ORACLE = f"""
    WITH {_NORMS_CTE},
    bucketed AS (
      SELECT e.vec_id, e.embedding, n.nsq,
             {_ann_bucket_sql('e.embedding', 4)} AS bucket
      FROM embeddings e JOIN norms n ON n.vec_id = e.vec_id
    ),
    q AS (SELECT * FROM bucketed WHERE vec_id < {N_QUERIES}),
    brute AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY {_dot_sql('q.embedding', 'c.embedding')}
                            / sqrt(q.nsq * c.nsq) DESC, c.vec_id) AS rank
        FROM q JOIN bucketed c ON c.vec_id != q.vec_id
      ) WHERE rank <= {TOP_K}
    ),
    ann AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY {_dot_sql('q.embedding', 'c.embedding')}
                            / sqrt(q.nsq * c.nsq) DESC, c.vec_id) AS rank
        FROM q JOIN bucketed c
          ON c.bucket = q.bucket AND c.vec_id != q.vec_id
      ) WHERE rank <= {TOP_K}
    ),
    perq AS (
      SELECT b.query_id, CAST(count(a.neighbor_id) AS BIGINT) AS n_hit
      FROM brute b
      LEFT JOIN ann a ON a.query_id = b.query_id
                     AND a.neighbor_id = b.neighbor_id
      GROUP BY b.query_id
    )
    SELECT query_id, CAST({TOP_K} AS BIGINT) AS k, n_hit,
           CAST(n_hit AS DOUBLE) / CAST({TOP_K} AS DOUBLE) AS recall_at_k
    FROM perq
    """


@register("similarity_ann_recall_report", _RECALL_ORACLE)
def similarity_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality observability: per-query recall@k of the
    LSH ANN tier against the exact brute-force answer — the
    continuous-evaluation number a production ANN deployment watches
    (probe parameters are tuned against exactly this curve). All-
    DataFrame: the two top-k frames (both deterministic) left-semi
    join on (query, neighbor); recall = hits/k. HASH-oracle-checked
    since r9: both arms are bit-reproducible cross-engine (the brute
    chain since r3, the LSH buckets since the r9 ANN conversion), so
    the oracle recomputes both top-5 sets from the same bucketed CTE
    and counts the intersection — the "no SQL twin" reason died with
    the ANN conversion. The aggregate recall bound stays pinned in
    tests/test_similarity.py."""
    from pyspark.sql import functions as F

    # persist the vector table: the exact and ANN retrievers each scan
    # it 2-3x (query + corpus arms) — 6 embeddings scans cold; an
    # evaluation op re-reading the corpus six times is exactly what it
    # exists to catch in others
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .persist()
    )
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    brute = brute_force_topk(queries, emb, k=TOP_K).select(
        "query_id", "neighbor_id"
    )
    ann = ann_lsh_topk(queries, emb, k=TOP_K, num_planes=4).select(
        "query_id", "neighbor_id"
    )
    hits = brute.join(ann, ["query_id", "neighbor_id"], "semi")
    per_q = hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        brute.select("query_id")
        .distinct()
        .join(per_q, "query_id", "left")
        .select(
            "query_id",
            F.lit(TOP_K).cast("long").alias("k"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            (
                F.coalesce("n_hit", F.lit(0)).cast("double")
                / F.lit(TOP_K).cast("double")
            ).alias("recall_at_k"),
        )
    )


KNN_QUERIES = 50  # vec_id < 50 is the classification eval set


@register(
    "ml_knn_classify",
    f"""
    WITH {_NORMS_CTE},
    ranked AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY {_dot_sql('q.embedding', 'c.embedding')}
                            / sqrt(nq.nsq * nc.nsq) DESC, c.vec_id) AS rank
        FROM embeddings q
        JOIN embeddings c ON c.vec_id != q.vec_id
        JOIN norms nq ON nq.vec_id = q.vec_id
        JOIN norms nc ON nc.vec_id = c.vec_id
        WHERE q.vec_id < {KNN_QUERIES}
      ) WHERE rank <= {TOP_K}
    ),
    votes AS (
      SELECT r.query_id, e.label AS nbr_label, COUNT(*) AS votes
      FROM ranked r JOIN embeddings e ON e.vec_id = r.neighbor_id
      GROUP BY 1, 2
    ),
    win AS (
      SELECT query_id, nbr_label AS pred_label, votes,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY votes DESC, nbr_label) AS rn
      FROM votes
    )
    SELECT w.query_id, q.label AS true_label, w.pred_label, w.votes,
           (w.pred_label = q.label) AS correct
    FROM win w JOIN embeddings q ON q.vec_id = w.query_id
    WHERE w.rn = 1
    """,
)
def ml_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification over the labeled embeddings: exact-cosine
    5 nearest neighbors (the bit-exact brute-force chain), majority
    label with ties to the smallest label, `correct` giving
    leave-one-out accuracy — the lazy-learner baseline next to the
    centroid (prototype) classifier. Selection-only floats: cosine
    ORDERS the neighbor sets, every compared column is an integer,
    label, or boolean. Query set bounded (broadcasts); corpus never
    shuffles — votes and argmax aggregate per query id."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < KNN_QUERIES)
    topk = brute_force_topk(queries, emb, k=TOP_K)
    lab = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nbr_label")
    )
    votes = (
        topk.join(lab, "neighbor_id")
        .groupBy("query_id", "nbr_label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    win = (
        votes.groupBy("query_id")
        .agg(
            F.max(
                F.struct(F.col("votes"), (-F.col("nbr_label")).alias("neg"))
            ).alias("w")
        )
        .select(
            "query_id",
            F.col("w.votes").alias("votes"),
            (-F.col("w.neg")).alias("pred_label"),
        )
    )
    truth = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return win.join(truth, "query_id").select(
        "query_id",
        "true_label",
        "pred_label",
        "votes",
        (F.col("pred_label") == F.col("true_label")).alias("correct"),
    )


def _pq_recall_oracle_sql() -> str:
    """Both arms bit-reproducible → the PQ recall report hash-checks:
    brute-force exact top-5 (the r3 chain) ∩ PQ-ADC top-5 (the late-r9
    chain) per query, recall = hits/k."""
    from .similarity import PQ_M

    code_cols = ",\n             ".join(
        f"MAX(CASE WHEN m = {m} THEN code END) AS code_{m}"
        for m in range(PQ_M)
    )
    adc_joins = "\n      ".join(
        f"JOIN qd qd{m} ON qd{m}.m = {m} AND qd{m}.cidx = p.code_{m}"
        + (
            f" AND qd{m}.vec_id = qd0.vec_id"
            if m
            else " AND qd0.vec_id != p.vec_id"
        )
        for m in range(PQ_M)
    )
    adc_chain = " + ".join(f"qd{m}.dist" for m in range(PQ_M))
    return f"""
    WITH centroids (m, cidx, c1, c2, c3, c4, c5, c6, c7, c8) AS (
      VALUES {_pq_values_sql()}
    ),
    {_NORMS_CTE},
    brute AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY {_dot_sql('q.embedding', 'c.embedding')}
                            / sqrt(nq.nsq * nc.nsq) DESC, c.vec_id) AS rank
        FROM embeddings q
        JOIN embeddings c ON c.vec_id != q.vec_id
        JOIN norms nq ON nq.vec_id = q.vec_id
        JOIN norms nc ON nc.vec_id = c.vec_id
        WHERE q.vec_id < {N_QUERIES}
      ) WHERE rank <= {TOP_K}
    ),
    enc AS (
      SELECT e.vec_id, c.m, c.cidx, {_pq_dist_sql('e.embedding')} AS dist
      FROM embeddings e CROSS JOIN centroids c
    ),
    codes AS (
      SELECT vec_id, m, cidx AS code FROM (
        SELECT vec_id, m, cidx,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY dist, cidx) AS rn
        FROM enc
      ) WHERE rn = 1
    ),
    codes_p AS (
      SELECT vec_id, {code_cols}
      FROM codes GROUP BY vec_id
    ),
    qd AS (
      SELECT q.vec_id, c.m, c.cidx, {_pq_dist_sql('q.embedding')} AS dist
      FROM embeddings q CROSS JOIN centroids c
      WHERE q.vec_id < {N_QUERIES}
    ),
    pq AS (
      SELECT query_id, neighbor_id FROM (
        SELECT qd0.vec_id AS query_id, p.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY qd0.vec_id
                                  ORDER BY {adc_chain}, p.vec_id) AS rank
        FROM codes_p p
        {adc_joins}
      ) WHERE rank <= {TOP_K}
    ),
    perq AS (
      SELECT b.query_id, CAST(count(a.neighbor_id) AS BIGINT) AS n_hit
      FROM brute b
      LEFT JOIN pq a ON a.query_id = b.query_id
                    AND a.neighbor_id = b.neighbor_id
      GROUP BY b.query_id
    )
    SELECT query_id, CAST({TOP_K} AS BIGINT) AS k, n_hit,
           CAST(n_hit AS DOUBLE) / CAST({TOP_K} AS DOUBLE) AS recall_at_k
    FROM perq
    """


@register("similarity_pq_recall_report", _pq_recall_oracle_sql())
def similarity_pq_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality observability for the PQ tier: per-query
    recall@k of PQ-ADC against the exact brute-force answer — the
    number a production deployment watches to size M/K or trigger
    re-training. Hash-oracle-checked end-to-end: both arms are
    bit-reproducible (brute chain since r3, PQ chains late r9), so
    the oracle recomputes both top-5 sets and counts the
    intersection."""
    from .similarity import pq_adc_topk

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .persist()
    )
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    brute = brute_force_topk(queries, emb, k=TOP_K).select(
        "query_id", "neighbor_id"
    )
    pq = pq_adc_topk(queries, emb, k=TOP_K).select("query_id", "neighbor_id")
    hits = brute.join(pq, ["query_id", "neighbor_id"], "semi")
    per_q = hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        brute.select("query_id")
        .distinct()
        .join(per_q, "query_id", "left")
        .select(
            "query_id",
            F.lit(TOP_K).cast("long").alias("k"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            (
                F.coalesce("n_hit", F.lit(0)).cast("double")
                / F.lit(TOP_K).cast("double")
            ).alias("recall_at_k"),
        )
    )


KCENTER_K = 8
_KC_NEW_CENTER = """(
      SELECT min(x.vec_id) FROM km x
      WHERE x.r = p.r AND x.sel_round IS NULL
        AND x.dmin = (SELECT max(y.dmin) FROM km y
                      WHERE y.r = p.r AND y.sel_round IS NULL))"""


def _kcenter_oracle() -> str:
    """Recursive-CTE replay of the greedy farthest-point traversal:
    the working table re-emits every point's min-distance-to-selected
    each round (the HITS state-re-emission shape); the new center is
    the max-dmin unselected point with min-id tie-break — the same
    (dmin, −id) struct-max Spark computes."""
    d_seed = _l2_sql("e.embedding", "s.embedding")
    d_new = _l2_sql("a.embedding", "b.embedding")
    return f"""
    WITH RECURSIVE
    km (r, vec_id, dmin, sel_round, sel_dist) AS (
      SELECT 0, e.vec_id, {d_seed},
             CASE WHEN e.vec_id = (SELECT min(vec_id) FROM embeddings)
                  THEN 0 ELSE NULL END,
             CAST(NULL AS DOUBLE)
      FROM embeddings e,
           (SELECT embedding FROM embeddings
            WHERE vec_id = (SELECT min(vec_id) FROM embeddings)) s
      UNION ALL
      SELECT p.r + 1, p.vec_id,
             least(p.dmin,
                   (SELECT {d_new}
                    FROM embeddings a, embeddings b
                    WHERE a.vec_id = p.vec_id
                      AND b.vec_id = {_KC_NEW_CENTER})),
             CASE WHEN p.sel_round IS NOT NULL THEN p.sel_round
                  WHEN p.vec_id = {_KC_NEW_CENTER} THEN p.r + 1
                  ELSE NULL END,
             CASE WHEN p.sel_round IS NOT NULL THEN p.sel_dist
                  WHEN p.vec_id = {_KC_NEW_CENTER} THEN p.dmin
                  ELSE NULL END
      FROM km p
      WHERE p.r < {KCENTER_K - 1}
    )
    SELECT CAST(sel_round AS BIGINT) AS sel_round,
           CAST(vec_id AS BIGINT) AS vec_id, sel_dist
    FROM km WHERE r = {KCENTER_K - 1} AND sel_round IS NOT NULL
    """


@register("pipeline_kcenter_coreset", _kcenter_oracle())
def pipeline_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset data selection (farthest-point
    traversal, Gonzalez 1985 / Sener & Savarese 2018) over the corpus
    embeddings — picks the 8 most mutually spread examples, the
    diversity-maximizing selection pass of a training-data pipeline.
    Fully deterministic (min-id seed, exact IEEE distance chains,
    (dmin, −id) argmax tie-break), so the whole greedy trajectory
    hash-checks against a recursive-CTE oracle. The radius sequence
    is additionally pytest-pinned monotone non-increasing."""
    from .similarity import kcenter_coreset

    return kcenter_coreset(
        load_table(spark, sf_dir, "embeddings"), k=KCENTER_K
    )


POWER_ITERS = 8
POWER_SCALE = 10**6
_PI_W = """(SELECT SUM(g.g * x.v) FROM gram g
            JOIN pi x ON x.dim = g.j AND x.r = p.r
            WHERE g.i = p.dim)"""
_PI_M = """(SELECT MAX(abs(
             (SELECT SUM(g2.g * x2.v) FROM gram g2
              JOIN pi x2 ON x2.dim = g2.j AND x2.r = p.r
              WHERE g2.i = y.dim)))
            FROM pi y WHERE y.r = p.r)"""


@register(
    "embedding_power_iteration",
    f"""
    WITH RECURSIVE
    s AS (
      SELECT vec_id, embedding,
             CAST(127.0 AS DOUBLE)
               / nullif(list_max(list_transform(embedding,
                                                x -> abs(CAST(x AS DOUBLE)))),
                        0) AS scale
      FROM embeddings
    ),
    q AS (
      SELECT s.vec_id, CAST(g.i - 1 AS BIGINT) AS dim,
             coalesce(CAST(floor(CAST(s.embedding[g.i] AS DOUBLE) * s.scale)
                           AS BIGINT), 0) AS qv
      FROM s, UNNEST(generate_series(1, len(s.embedding))) AS g(i)
    ),
    gram AS (
      SELECT a.dim AS i, b.dim AS j, SUM(a.qv * b.qv) AS g
      FROM q a JOIN q b ON a.vec_id = b.vec_id
      GROUP BY 1, 2
    ),
    pi (r, dim, v) AS (
      SELECT 0, d.i, CAST({POWER_SCALE} AS BIGINT)
      FROM (SELECT DISTINCT i FROM gram) d(i)
      UNION ALL
      SELECT p.r + 1, p.dim,
             CASE WHEN {_PI_W} >= 0
                  THEN {_PI_W} // greatest({_PI_M} // {POWER_SCALE}, 1)
                  ELSE -((-{_PI_W}) // greatest({_PI_M} // {POWER_SCALE}, 1))
             END
      FROM pi p WHERE p.r < {POWER_ITERS}
    )
    SELECT dim, v AS v_fp FROM pi WHERE r = {POWER_ITERS}
    """,
)
def embedding_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the int8-quantized corpus —
    exact-integer power iteration (the fixed-point family's spectral
    member). The d×d Gram reduces distributedly (partial-aggregated
    explode, shuffle bounded by partitions × d² longs); the 8
    renormalized matrix-vector rounds replay in the oracle as a
    recursive CTE with sign-explicit truncating division. Known-
    direction and normalization-bound properties pytest-pinned."""
    from .similarity import power_iteration_int8

    return power_iteration_int8(
        load_table(spark, sf_dir, "embeddings"),
        n_iter=POWER_ITERS,
        scale=POWER_SCALE,
    )


@register(
    "ml_eval_cluster_purity",
    f"""
    WITH seeds AS (
      SELECT vec_id AS list_id, embedding AS center
      FROM embeddings WHERE vec_id < {SEMANTIC_FROZEN_LISTS}
    ),
    dists AS (
      SELECT c.vec_id, s.list_id,
             {_l2_sql('c.embedding', 's.center')} AS d
      FROM embeddings c, seeds s
    ),
    assigned AS (
      SELECT e.vec_id, t.list_id AS cluster_id, e.label
      FROM (
        SELECT vec_id, list_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d ASC, list_id ASC) AS rn
        FROM dists
      ) t
      JOIN embeddings e ON e.vec_id = t.vec_id
      WHERE t.rn = 1
    ),
    cell AS (
      SELECT cluster_id, label, CAST(COUNT(*) AS BIGINT) AS n
      FROM assigned GROUP BY 1, 2
    )
    SELECT cluster_id,
           CAST(SUM(n) AS BIGINT) AS cluster_size,
           CAST(MAX(n) AS BIGINT) AS majority_count,
           CAST(MIN(CASE WHEN n = (SELECT MAX(n2.n) FROM cell n2
                                   WHERE n2.cluster_id = cell.cluster_id)
                         THEN label END) AS BIGINT) AS majority_label,
           CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS purity
    FROM cell
    GROUP BY cluster_id
    """,
)
def ml_eval_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-purity evaluation of the frozen-codebook quantizer
    against the embeddings' ground-truth labels — the clustering
    member of the model-eval family (AUC/PR evaluate the classifier;
    this evaluates the partitioner the ANN/dedup tiers share): per
    cluster its size, the majority label (smallest label on count
    ties — engine-portable), the majority count, and purity as one
    IEEE division of exact integers.

    Plan: the same broadcast-codebook min-struct assignment as
    dedup_semantic_frozen (corpus never shuffles for it), then a
    (cluster × label) contingency aggregation — bounded by
    K × |label vocabulary|, never by corpus size."""
    from .similarity import l2_sq

    emb = load_table(spark, sf_dir, "embeddings")
    seeds = emb.where(F.col("vec_id") < SEMANTIC_FROZEN_LISTS).select(
        F.col("vec_id").cast("long").alias("list_id"),
        F.col("embedding").alias("center"),
    )
    assigned = (
        emb.select("vec_id", "embedding", "label")
        .crossJoin(F.broadcast(seeds))
        .select(
            "vec_id",
            "label",
            "list_id",
            l2_sq("embedding", "center").alias("d"),
        )
        .groupBy("vec_id")
        .agg(
            F.min(F.struct("d", "list_id")).getField("list_id").alias("cluster_id"),
            F.first("label").alias("label"),
        )
    )
    cell = assigned.groupBy("cluster_id", "label").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wmax = Window.partitionBy("cluster_id")
    per = cell.withColumn("max_n", F.max("n").over(wmax))
    return per.groupBy("cluster_id").agg(
        F.sum("n").cast("long").alias("cluster_size"),
        F.max("n").cast("long").alias("majority_count"),
        F.min(F.when(F.col("n") == F.col("max_n"), F.col("label")))
        .cast("long")
        .alias("majority_label"),
        (F.max("n").cast("double") / F.sum("n").cast("double")).alias("purity"),
    )


KMEANS_Q8_CELLS = """
cells AS MATERIALIZED (
  SELECT vec_id, CAST(g.i - 1 AS BIGINT) AS dim,
         CAST(coalesce(CAST(floor(CAST(s.embedding[g.i] AS DOUBLE) * s.scale)
                       AS INTEGER), 0) AS BIGINT) AS qv
  FROM (
    SELECT vec_id, embedding,
           CAST(127.0 AS DOUBLE)
             / nullif(list_max(list_transform(embedding,
                                              x -> abs(CAST(x AS DOUBLE)))), 0)
             AS scale
    FROM embeddings
  ) s, UNNEST(generate_series(1, len(s.embedding))) AS g(i)
)
"""


def _kmeans_q8_oracle(k: int, rounds: int, cs: int) -> str:
    """Unrolled MATERIALIZED-CTE replay of the fixed-point Lloyd's
    loop (the unigram-trainer oracle pattern: one assignment CTE +
    one centroid-update CTE per round; recursive CTEs cannot be
    layered, and without materialization each round would inline the
    previous one twice)."""
    ctes = [
        KMEANS_Q8_CELLS,
        f"""
cent0 AS MATERIALIZED (
  SELECT vec_id AS cid, dim, qv * {cs} AS c
  FROM cells WHERE vec_id < {k}
)""",
    ]
    for r in range(rounds):
        ctes.append(
            f"""
asg{r} AS MATERIALIZED (
  SELECT vec_id, cid, d2 FROM (
    SELECT t.vec_id, t.cid, t.d2,
           ROW_NUMBER() OVER (PARTITION BY t.vec_id
                              ORDER BY t.d2 ASC, t.cid ASC) AS rn
    FROM (
      SELECT x.vec_id, c.cid,
             SUM((x.qv * {cs} - c.c) * (x.qv * {cs} - c.c)) AS d2
      FROM cells x JOIN cent{r} c ON c.dim = x.dim
      GROUP BY x.vec_id, c.cid
    ) t
  ) q WHERE rn = 1
)"""
        )
        if r < rounds - 1:
            ctes.append(
                f"""
cent{r + 1} AS MATERIALIZED (
  SELECT p.cid, p.dim,
         CASE WHEN m.s IS NULL THEN p.c
              WHEN m.s >= 0 THEN m.s // m.n
              ELSE -((-m.s) // m.n) END AS c
  FROM cent{r} p
  LEFT JOIN (
    SELECT a.cid, x.dim, SUM(x.qv * {cs}) AS s, COUNT(*) AS n
    FROM asg{r} a JOIN cells x ON x.vec_id = a.vec_id
    GROUP BY a.cid, x.dim
  ) m ON m.cid = p.cid AND m.dim = p.dim
)"""
            )
    return (
        "WITH "
        + ",".join(ctes)
        + f"""
SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id, CAST(d2 AS BIGINT) AS d2
FROM asg{rounds - 1}
"""
    )


from .similarity import (  # noqa: E402
    KMEANS_Q8_K,
    KMEANS_Q8_ROUNDS,
    KMEANS_Q8_SCALE,
)


@register(
    "ml_kmeans_train_q8",
    _kmeans_q8_oracle(KMEANS_Q8_K, KMEANS_Q8_ROUNDS, KMEANS_Q8_SCALE),
)
def ml_kmeans_train_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point Lloyd's k-means over the int8-quantized corpus —
    the clustering member of the exact-integer training tier
    (pagerank → perceptron → logreg → k-means): 6 full Lloyd rounds
    with frozen first-k init, exact BIGINT distances, truncdiv
    centroid means and empty-cluster carry-forward, replayed
    bit-for-bit by the unrolled DuckDB twin. The float Spark-ML tier
    (`dedup_semantic_kmeans`) keeps owning recall/quality; this entry
    gives the ITERATION SEMANTICS a hard driver hash check. Output:
    final (vec_id, cluster_id, d2). See
    operators/similarity.py:kmeans_q8 for the scale argument.

    Degenerate-input asymmetry (deliberate, ADVICE r12): ids 0..k-1
    missing raises ValueError on the Spark side (frozen-init
    contract) while the DuckDB twin would silently shrink the
    codebook — fail-loud hardening, not an oracle regression."""
    from .similarity import kmeans_q8

    return kmeans_q8(load_table(spark, sf_dir, "embeddings"))
