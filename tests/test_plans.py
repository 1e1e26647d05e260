"""Plan-shape regression tests — pin the scale-critical plan features
(pushdown, pruning, broadcast, top-k physical op) so a refactor that
silently loses one fails CI."""

from __future__ import annotations

from bigquery_postgres_events_etl_spark.plans.audit import (
    has_pushed_filter,
    plan_summary,
    scan_is_pruned,
)
from bigquery_postgres_events_etl_spark.registry import all_queries


def test_q1_pushdown_and_pruning(spark, sf_dir):
    df = all_queries()["q1_pricing_summary"](spark, sf_dir)
    assert has_pushed_filter(df, "l_shipdate")
    assert scan_is_pruned(df, 7)  # 7 of 11 lineitem columns


def test_q3_broadcasts_dims(spark, sf_dir):
    s = plan_summary(all_queries()["q3_shipping_priority"](spark, sf_dir))
    assert s["broadcast_hash_joins"] >= 2
    assert s["nested_loop_joins"] == 0
    assert s["take_ordered"]  # top-10 is TakeOrderedAndProject, not a global sort


def test_flagship_filters_reach_scan(spark, sf_dir):
    df = all_queries()["etl_flagship"](spark, sf_dir)
    assert has_pushed_filter(df, "user_id")
    assert has_pushed_filter(df, "event_type")


def test_sessionization_single_exchange(spark, sf_dir):
    """All three window steps + the final agg share one user_id
    shuffle (exchange reuse)."""
    s = plan_summary(all_queries()["sessionization"](spark, sf_dir))
    assert s["exchanges"] <= 2  # one data exchange (+ AQE read wrapper)


def test_topk_is_take_ordered(spark, sf_dir):
    s = plan_summary(all_queries()["sort_topk_events"](spark, sf_dir))
    assert s["take_ordered"]
