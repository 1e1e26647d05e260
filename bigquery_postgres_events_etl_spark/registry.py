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
# frontier instead of re-checking the same 50. r4 front-load:
# text_fingerprints (re-plumbed through the r3 exploded_shingles
# restructure, landed at position 51 and missed the r3 sample — the
# one stale-plan entry), then this round's 10 new entries, then the
# 44 entries whose freshest green row is r1. 1+10+44 = 55 > 50: the
# last five r1-group entries (asof_join_last_click onward) and the
# r2-last fills sit past the sample — r5 must re-front whatever this
# round's CORRECTNESS file does not cover.
_DRIVER_PRIORITY = [
    # -- plan changed r3, unattested since (the r3 process bug)
    "text_fingerprints",
    # -- new / changed this round (attest first time)
    "dedup_semantic_kmeans",
    "text_pii_scan",
    "text_token_rarity",
    "rfm_segmentation",
    "dedup_simhash_fast",
    "dedup_ngram_containment",
    "pipeline_blocklist_filter",
    "pipeline_length_buckets",
    "sliding_window_distinct_users",
    "multimodal_image_resize",
    "multimodal_audio_resample",
    "stats_winsorize_lineitem",
    "user_feature_matrix",
    "active_user_rollups",
    "pipeline_corpus_prep_full",
    "events_wow_growth",
    "events_hourly_seasonality",
    "embedding_random_projection",
    "part_pairs_cooccurrence",
    # -- freshest attestation is r1 (44 entries — refresh them all)
    "etl_flagship",
    "q1_pricing_summary",
    "dedup_exact",
    "filter_valid_users",
    "filter_tracked_events",
    "filter_watermark",
    "filter_date_range",
    "param_extract_json",
    "sort_topk_events",
    "watermark_running_max",
    "event_counts_by_type",
    "csv_projection",
    "scalar_date_functions",
    "etl_struct_params",
    "funnel_conversion",
    "profile_columns",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "agg_global_stats",
    "agg_rollup",
    "agg_cube",
    "pivot_priority_by_status",
    "join_broadcast_dim",
    "join_sort_merge_fact",
    "join_left_outer",
    "join_semi",
    "join_anti",
    "set_union",
    "set_intersect",
    "set_except",
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
    # -- r2-last high-traffic fills (complete the 50)
    "sessionization",
    "similarity_topk_bruteforce",
    "similarity_near_pairs",
    "text_stats",
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
    )

    _LOADED = True
