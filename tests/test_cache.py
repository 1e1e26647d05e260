"""Cache-lifecycle contract (r6 verdict item #4).

Operators persist() shared intermediates and never unpersist (the
returned lazy plan references the cache), which is correct per entry
but accumulates across entries in a long-lived session. The
``scoped_cache`` policy bounds that: everything cached during a run
dies with the run. These tests sweep the persist-heaviest registry
entries TWICE through scoped runs and pin that the session's cache
stays empty between runs — the leak the bench/oracle harnesses (which
clearCache per entry) never showed.
"""

from __future__ import annotations

from bigquery_postgres_events_etl_spark.cache import (
    cached_dataframe_plans,
    persistent_rdd_count,
    scoped_cache,
)
from bigquery_postgres_events_etl_spark.registry import all_queries

# The entries with persist() sites in their operators — the ones that
# actually leak without a scope (kept current by the sweep itself: a
# new persist site in any listed entry is covered automatically, and
# the point is the policy, not the census).
PERSISTING_ENTRIES = [
    "dedup_ngram_jaccard",
    "dedup_minhash_signatures",
    "dedup_entity_resolve",
    "dedup_semantic",
    "similarity_hybrid_topk",
    "text_nb_quality_score",
    "text_nb_calibration",
    "cohort_ltv_curves",
    "events_burst_detection",
    "stats_robust_zscore",
]


def test_scoped_runs_leave_no_cache_behind(spark, sf_dir):
    """Two sweeps over the persist-heavy entries: after every scoped
    run the CacheManager must be empty and no RDD storage registered —
    i.e. cache usage is bounded by ONE run's working set, not by the
    session's history."""
    qs = all_queries()
    spark.catalog.clearCache()  # pristine baseline
    for sweep in range(2):
        for name in PERSISTING_ENTRIES:
            with scoped_cache(spark):
                qs[name](spark, sf_dir).count()
            assert not cached_dataframe_plans(spark), (
                f"cached plans survived scoped run of {name} (sweep {sweep})"
            )
            assert persistent_rdd_count(spark) == 0, (
                f"RDD storage survived scoped run of {name} (sweep {sweep})"
            )


def test_entries_do_persist_inside_the_scope(spark, sf_dir):
    """The inverse control: the listed entries really do cache inside
    a run (otherwise the leak test is vacuous)."""
    qs = all_queries()
    spark.catalog.clearCache()
    with scoped_cache(spark):
        qs["dedup_ngram_jaccard"](spark, sf_dir).count()
        assert cached_dataframe_plans(spark), (
            "expected dedup_ngram_jaccard to persist its shingle frame"
        )
    assert not cached_dataframe_plans(spark)
