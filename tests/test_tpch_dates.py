"""Properties of the synthesized shipping columns (queries_tpch_dates).

The Q4/Q12/Q19/Q21 oracles prove cross-engine parity; these pin the
SEMANTIC invariants of the synthesis itself, so a future tweak to the
modular constants can't silently produce a degenerate population
(e.g. no late lines → Q4/Q21 vacuously empty — the failure mode the
edit-distance K=3 probe caught for that entry).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigquery_postgres_events_etl_spark.operators.queries_tpch_dates import (
    _CONTAINERS,
    _INSTRUCTS,
    _MODES,
    synth_lineitem_x,
    synth_part_x,
)


def test_synth_shipping_invariants(spark, sf_dir):
    lx = synth_lineitem_x(spark, sf_dir)
    row = lx.agg(
        F.count(F.lit(1)).alias("n"),
        # receipt strictly after shipment, within 30 days
        F.count_if(F.col("l_receiptdate") <= F.col("l_shipdate").cast("date")).alias(
            "bad_receipt"
        ),
        F.max(
            F.datediff(F.col("l_receiptdate"), F.col("l_shipdate").cast("date"))
        ).alias("max_receipt_lag"),
        # commit within ±30 days of shipment
        F.max(
            F.abs(F.datediff(F.col("l_commitdate"), F.col("l_shipdate").cast("date")))
        ).alias("max_commit_abs"),
        # BOTH populations must exist: late (receipt > commit) and
        # on-time — Q4/Q12/Q21 are vacuous without both
        F.count_if(F.col("l_receiptdate") > F.col("l_commitdate")).alias("late"),
        F.count_if(F.col("l_receiptdate") <= F.col("l_commitdate")).alias("ontime"),
    ).collect()[0]
    assert row.n > 0
    assert row.bad_receipt == 0
    assert row.max_receipt_lag <= 30
    assert row.max_commit_abs <= 30
    assert row.late > 0 and row.ontime > 0, row

    domains = lx.agg(
        F.collect_set("l_shipmode").alias("modes"),
        F.collect_set("l_shipinstruct").alias("instr"),
    ).collect()[0]
    assert set(domains.modes) == set(_MODES)
    assert set(domains.instr) == set(_INSTRUCTS)


def test_synth_part_container_domain(spark, sf_dir):
    px = synth_part_x(spark, sf_dir)
    got = {r.p_container for r in px.select("p_container").distinct().collect()}
    assert got == set(_CONTAINERS)
    # Q19's three branches each need a non-empty (brand, container
    # family) population
    for brand, fams in [
        ("Brand#12", ("SM CASE", "SM BOX", "SM PACK", "SM PKG")),
        ("Brand#23", ("MED BAG", "MED BOX", "MED PKG", "MED PACK")),
        ("Brand#3", ("LG CASE", "LG BOX", "LG PACK", "LG PKG")),
    ]:
        n = px.where(
            (F.col("p_brand") == brand) & F.col("p_container").isin(*fams)
        ).count()
        assert n > 0, f"{brand} x {fams[0][:3]} family empty — Q19 branch vacuous"
