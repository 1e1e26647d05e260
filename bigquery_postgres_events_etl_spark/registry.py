"""Query registry — the oracle-checked operator surface.

Every operator from SURVEY §2 (plus the query-layer and LLM-pipeline
operators) registers here as a named (spark_fn, oracle_sql) pair. The
driver runs the Spark side and the DuckDB side at sf0.01 and compares
row-count + schema + order-insensitive value-hash.

Conventions that make the hashes match:
- every computed column is aliased identically on both sides;
- double aggregations go through exact DECIMAL sums (functions.scalars
  dsum/davg) — order-independent, bit-exact across engines;
- window/dedup survivors are made deterministic with explicit
  tie-break ordering;
- fixture ``events.ts`` is parquet TIMESTAMP(NANOS): Spark reads int64
  nanos (io.load_table converts to µs TimestampType), the oracle uses
  ``CAST(ts AS TIMESTAMP)`` — identical µs truncation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QuerySpec = tuple[Callable[[SparkSession, str], DataFrame], str | None]

_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under
    ``name`` with its DuckDB oracle SQL (None → rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


# The driver's correctness gate checks a prefix-sample of this dict
# (the first 50, in registration order). Every entry is locally
# verified by tools/check_oracle.py; this list rotates (a) entries
# whose PLAN changed since their last green driver row, (b) new
# entries, then (c) the entries with the OLDEST attestation, to the
# front — so each round's CORRECTNESS file attests the staleness
# frontier instead of re-checking the same 50.
#
# r5 front-load: all 41 never-attested r5 entries (newest first:
# contrastive prep, equi-depth histogram, media dedup, second-order
# transitions, correlation matrix, CUSUM, JSON profiling, MMR,
# association rules, temperature mixture, model scoring, feature
# hashing, PageRank, BPE training, interval overlap, stratified
# sample, z-order, mergeable rollups, paragraph dedup, BM25, DQ
# suite, SCD2, snapshot diff, then the first-wave r5 batch from
# entity resolve through HLL rollups) plus the two re-attests for
# the with_global_ranks boundary fix (rfm, ccnet). The driver's
# 50-sample covers through roughly the first-wave batch; the 14
# r1-stale and the r2 tail listed below roll to the r6 front —
# r6 must front anything here that misses this round's sample.
_DRIVER_PRIORITY = [
    # -- new this round (attest first time)
    "join_cardinality_estimate",
    "attribution_position_credit",
    "funnel_ordered_steps",
    "embedding_label_centroids",
    "similarity_hard_negatives",
    "pipeline_negative_sampling",
    "lineitem_equidepth_histogram",
    # re-attest the two-pass-ranking consumers after the boundary-
    # consistency fix in ranking.with_global_ranks (localCheckpoint)
    "rfm_segmentation",
    "text_ccnet_buckets",
    "multimodal_content_dedup",
    "event_second_order_transitions",
    "lineitem_correlation_matrix",
    "events_cusum_changepoints",
    "events_json_key_stats",
    "similarity_mmr_topk",
    "part_association_rules",
    "pipeline_temperature_mixture",
    "ml_linear_score_users",
    "text_feature_hashing",
    "graph_pagerank_copurchase",
    "text_bpe_train_merges",
    "interval_overlap_sessions",
    "pipeline_stratified_sample",
    "events_zorder_index",
    "events_mergeable_daily_rollup",
    "events_approx_topk_rollup",
    "pipeline_paragraph_dedup",
    "text_bm25_topk",
    "dq_expectations_report",
    "etl_scd2_user_state",
    "etl_snapshot_diff",
    "dedup_entity_resolve",
    "pipeline_cdc_chunks",
    "text_bigram_coherence",
    "pipeline_source_caps",
    "similarity_hybrid_topk",
    "stats_robust_zscore",
    "dedup_cdc_chunk_spans",
    "pipeline_importance_weight",
    "events_burst_detection",
    "asof_join_next_purchase",
    "dedup_exact_normalized",
    "dedup_stats_report",
    "events_hll_rolling_users",
    # -- freshest attestation is r1 (14 entries — refresh them all)
    "distinct_segments",
    "string_functions",
    "case_when_bucketing",
    "window_topk_per_group",
    "window_running_sum",
    "window_moving_avg",
    "window_lag_lead",
    "window_dedup_survivor",
    "mode_per_group",
    "asof_join_last_click",
    "range_join_recent_lineitems",
    "tumbling_window_hourly",
    "sliding_window_counts",
    "dedup_minhash_signatures",
    # -- freshest attestation is r2 (oldest 22 of 43; the other 21
    #    roll to the r6 front)
    "sessionization",
    "similarity_topk_bruteforce",
    "similarity_near_pairs",
    "text_stats",
    "text_token_frequencies",
    "text_language_id",
    "text_quality_score",
    "multimodal_binary_stats",
    "multimodal_feature_extract",
    "multimodal_frame_sample",
    "sql_scalar_subquery",
    "sql_in_subquery",
    "sql_correlated_exists",
    "sql_not_exists",
    "sql_grouping_sets",
    "sql_having",
    "sql_window_over_derived",
    "math_functions",
    "null_handling",
    "agg_variance_from_sums",
    "agg_correlation_from_sums",
    "date_parts",
]


def _ordered() -> dict[str, QuerySpec]:
    front = [n for n in _DRIVER_PRIORITY if n in _REGISTRY]
    rest = [n for n in _REGISTRY if n not in _DRIVER_PRIORITY]
    return {n: _REGISTRY[n] for n in front + rest}


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {k: v[0] for k, v in _ordered().items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {k: v[1] for k, v in _ordered().items() if v[1] is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        queries_etl,
        queries_relational,
        queries_window,
        queries_temporal,
        queries_dedup,
        queries_similarity,
        queries_text,
        queries_multimodal,
        queries_sql,
        queries_scalars,
        queries_stats,
        queries_skew,
        queries_agg2,
        queries_misc,
        queries_tpch,
        queries_analytics,
        queries_pipeline,
        zorder,
        graph,
    )

    _LOADED = True
