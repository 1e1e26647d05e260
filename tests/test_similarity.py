"""ANN recall contract vs brute force (the correctness check for the
non-SQL-expressible LSH tier)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigquery_postgres_events_etl_spark.io import load_table
from bigquery_postgres_events_etl_spark.operators.similarity import (
    ann_lsh_topk,
    brute_force_topk,
    with_lsh_bucket,
)


def test_ann_lsh_recall(spark, sf_dir):
    """With few planes (big buckets) the bucketed search must recover
    most of the true top-5; this pins the contract that ANN is a
    recall/cost dial, not a different answer."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(queries, emb, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in ann_lsh_topk(queries, emb, k=5, num_planes=2).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.25, f"ANN recall {recall} too low even for 2 planes"


def test_lsh_buckets_partition_corpus(spark, sf_dir):
    """Bucketing is total and deterministic: every vector gets exactly
    one bucket id in [0, 2^planes), stable across invocations."""
    emb = load_table(spark, sf_dir, "embeddings")
    b1 = with_lsh_bucket(emb, num_planes=4).select("vec_id", "lsh_bucket")
    assert b1.where((F.col("lsh_bucket") < 0) | (F.col("lsh_bucket") >= 16)).count() == 0
    b2 = with_lsh_bucket(emb, num_planes=4).select("vec_id", "lsh_bucket")
    assert b1.exceptAll(b2).count() == 0


def test_brute_force_topk_is_k_per_query(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    out = brute_force_topk(queries, emb, k=3)
    per_q = out.groupBy("query_id").count().collect()
    assert len(per_q) == 5 and all(r["count"] == 3 for r in per_q)


def test_ivf_recall(spark, sf_dir):
    """IVF with 8 lists / 2 probes must recover a solid share of the
    true top-5 (probing 1/4 of the corpus)."""
    from bigquery_postgres_events_etl_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(queries, emb, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(queries, emb, k=5, n_lists=8, n_probe=2).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.3, f"IVF recall {recall}"


def test_multiprobe_beats_single_probe(spark, sf_dir):
    """Multi-probe recall must dominate single-probe at the same
    plane count (its candidate set is a strict superset)."""
    from bigquery_postgres_events_etl_spark.operators.similarity import (
        ann_lsh_topk_multiprobe,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(queries, emb, k=5).collect()
    }
    # 4 planes -> 16 buckets on the 500-vector smoke corpus; probing
    # 5/16 buckets should lift recall well above the single probe
    single = {
        (r.query_id, r.neighbor_id)
        for r in ann_lsh_topk(queries, emb, k=5, num_planes=4).collect()
    }
    multi = {
        (r.query_id, r.neighbor_id)
        for r in ann_lsh_topk_multiprobe(queries, emb, k=5, num_planes=4).collect()
    }
    r_single = len(truth & single) / len(truth)
    r_multi = len(truth & multi) / len(truth)
    assert r_multi >= r_single
    assert r_multi >= 0.4, f"multi-probe recall {r_multi}"


def test_quantize_int8_zero_vector_guard(spark):
    """All-zero vectors must quantize to all-zero int8 with NULL scale
    — not Inf·0 = NaN → null elements (the silent-corruption path)."""
    from bigquery_postgres_events_etl_spark.operators.similarity import (
        quantize_embeddings_int8,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [0.5, -1.0, 0.25])],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings_int8(df).collect()}
    assert rows[1]["scale"] is None
    assert rows[1]["q8"] == [0, 0, 0]
    assert rows[2]["scale"] == 127.0
    assert rows[2]["q8"] == [63, -127, 31]
