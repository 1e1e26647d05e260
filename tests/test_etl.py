"""Semantic property tests for the ETL-parity layer (SURVEY §5.3)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigquery_postgres_events_etl_spark.functions.scalars import (
    param_last_wins,
    parse_date_multi,
)
from bigquery_postgres_events_etl_spark.io import load_table
from bigquery_postgres_events_etl_spark.operators.etl import (
    flagship_pipeline,
    valid_user_filter,
)
from bigquery_postgres_events_etl_spark.schemas import GA4_EVENT_SCHEMA


def _param(key, val):
    return Row(key=key, value=Row(string_value=val))


def _ga4_row(user="u1", name="purchase", ts=1, date=None, params=None):
    return Row(
        user_id=user,
        event_name=name,
        event_timestamp=ts,
        event_date=date or datetime.date(2024, 1, 1),
        event_params=params or [],
    )


def test_param_extraction_last_wins(spark):
    """The reference's loop keeps the LAST matching param — no break
    (extract_bq.py:160-164)."""
    df = spark.createDataFrame(
        [
            _ga4_row(params=[_param("id", "first"), _param("id", "last")]),
            _ga4_row(user="u2", params=[_param("name", "n1")]),
            _ga4_row(user="u3", params=[]),
            _ga4_row(user="u4", params=[_param("other", "x")]),
        ],
        GA4_EVENT_SCHEMA,
    )
    got = df.select(
        "user_id", param_last_wins("event_params", "id").alias("event_id")
    ).collect()
    by_user = {r.user_id: r.event_id for r in got}
    assert by_user == {"u1": "last", "u2": None, "u3": None, "u4": None}


def test_valid_user_filter_rejects_null_and_empty(spark):
    """F1/F2 parity: NULL and '' user ids excluded
    (extract_bq.py:111-112)."""
    df = spark.createDataFrame(
        [_ga4_row(user=None), _ga4_row(user=""), _ga4_row(user="ok")],
        GA4_EVENT_SCHEMA,
    )
    got = [r.user_id for r in valid_user_filter(df).collect()]
    assert got == ["ok"]


def test_parse_date_multi_formats(spark):
    """X1 parity: the reference's four formats parse; junk → NULL
    (extract_bq.py:278-288)."""
    df = spark.createDataFrame(
        [("2024-01-15",), ("2024/01/15",), ("15-01-2024",), ("15/01/2024",), ("junk",)],
        T.StructType([T.StructField("s", T.StringType())]),
    )
    got = df.select(parse_date_multi("s").alias("d")).collect()
    expected = datetime.date(2024, 1, 15)
    assert [r.d for r in got] == [expected] * 4 + [None]


def test_flagship_dedup_idempotent(spark, sf_dir):
    """K4: the pipeline output has unique dedup keys, and re-running
    it produces the identical result (idempotence, README.md:148)."""
    events = load_table(spark, sf_dir, "events")
    out1 = flagship_pipeline(events)
    keys = out1.select("user_id", "event_timestamp", "event_name")
    assert keys.count() == keys.distinct().count()
    assert out1.exceptAll(flagship_pipeline(events)).count() == 0


def test_flagship_watermark_excludes_late_rows(spark, sf_dir):
    """ST7 parity: rows at-or-below the watermark never appear."""
    events = load_table(spark, sf_dir, "events")
    wm = events.agg(F.percentile_approx(F.unix_micros("ts"), 0.5)).first()[0]
    out = flagship_pipeline(events, watermark_us=wm)
    assert out.where(F.col("event_timestamp") <= wm).count() == 0
    assert out.count() > 0


def test_flagship_source_format_agnostic(spark, sf_dir, tmp_path):
    """The ETL core must not care what container the events arrive in:
    CSV (header + explicit schema), JSON lines, and ORC copies of the
    events table all produce the identical flagship result as the
    parquet path — the Spark-native version of the reference's
    'source is whatever BigQuery returns'. Timestamps round-trip as
    µs-epoch integers in the text formats (CSV/JSON have no native
    timestamp) and natively in ORC."""
    from pyspark.sql import functions as F

    from bigquery_postgres_events_etl_spark.io import load_table
    from bigquery_postgres_events_etl_spark.operators.etl import flagship_pipeline

    events = load_table(spark, sf_dir, "events")
    want = {tuple(r) for r in flagship_pipeline(events).collect()}
    assert want

    as_int = events.withColumn("ts", F.unix_micros("ts"))
    schema = as_int.schema

    csv_dir = str(tmp_path / "ev_csv")
    as_int.write.option("header", True).mode("overwrite").csv(csv_dir)
    from_csv = (
        spark.read.schema(schema).option("header", True).csv(csv_dir)
        .withColumn("ts", F.timestamp_micros("ts"))
    )
    assert {tuple(r) for r in flagship_pipeline(from_csv).collect()} == want

    json_dir = str(tmp_path / "ev_json")
    as_int.write.mode("overwrite").json(json_dir)
    from_json = (
        spark.read.schema(schema).json(json_dir)
        .withColumn("ts", F.timestamp_micros("ts"))
    )
    assert {tuple(r) for r in flagship_pipeline(from_json).collect()} == want

    orc_dir = str(tmp_path / "ev_orc")
    events.write.mode("overwrite").orc(orc_dir)
    from_orc = spark.read.orc(orc_dir)
    assert {tuple(r) for r in flagship_pipeline(from_orc).collect()} == want


def test_l_diversity_planted_cohorts(spark):
    """A cohort whose members all share one sensitive value violates
    l=3 with dominant_share 1.0; a cohort spread over 3 sources
    passes with share 1/3."""
    from bigquery_postgres_events_etl_spark.registry import all_queries
    import tempfile

    rows = (
        # cohort (en, bucket 0): 3 docs, all src0 -> violates
        [(i, "x", "en", "src0", 10) for i in range(3)]
        # cohort (de, bucket 0): 3 docs, three sources -> passes
        + [(10 + j, "x", "de", f"src{j}", 10) for j in range(3)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.mode("overwrite").parquet(d + "/documents.parquet")
        out = {
            (r.lang, r.len_bucket): r
            for r in all_queries()["dq_l_diversity"](spark, d).collect()
        }
    en, de = out[("en", 0)], out[("de", 0)]
    assert en.violates_l and en.n_distinct_sensitive == 1
    assert en.dominant_share == 1.0
    assert not de.violates_l and de.n_distinct_sensitive == 3
    assert abs(de.dominant_share - 1 / 3) < 1e-12


def test_referential_integrity_planted_orphans(spark):
    """Orphan rows and keys are counted exactly; an intact chain
    reports zeros. Planted: 2 lineitem rows referencing a missing
    order (1 distinct key), one order referencing a missing customer."""
    import tempfile

    from bigquery_postgres_events_etl_spark.registry import all_queries

    li = spark.createDataFrame(
        [(1, 100), (1, 101), (2, 100), (99, 100), (99, 101)],
        "l_orderkey long, l_partkey long",
    )
    orders = spark.createDataFrame(
        [(1, 10), (2, 77)], "o_orderkey long, o_custkey long"
    )
    cust = spark.createDataFrame([(10,)], "c_custkey long")
    part = spark.createDataFrame([(100,), (101,)], "p_partkey long")
    with tempfile.TemporaryDirectory() as tmp:
        li.write.parquet(tmp + "/lineitem.parquet")
        orders.write.parquet(tmp + "/orders.parquet")
        cust.write.parquet(tmp + "/customer.parquet")
        part.write.parquet(tmp + "/part.parquet")
        out = {
            r.relationship: r
            for r in all_queries()["dq_referential_integrity"](spark, tmp).collect()
        }
    lo = out["lineitem.l_orderkey->orders.o_orderkey"]
    assert (lo.n_child_rows, lo.n_orphan_rows, lo.n_orphan_keys) == (5, 2, 1)
    assert not lo.intact
    oc = out["orders.o_custkey->customer.c_custkey"]
    assert (oc.n_orphan_rows, oc.n_orphan_keys) == (1, 1) and not oc.intact
    lp = out["lineitem.l_partkey->part.p_partkey"]
    assert lp.n_orphan_rows == 0 and lp.intact


def test_t_closeness_planted_skewed_cohort(spark, tmp_path):
    """A cohort whose sensitive distribution mirrors the global one
    has TVD 0 (no violation); a planted single-source cohort in a
    50/50 corpus has TVD ≈ 1/2 and violates t = 1/5. Exact-integer
    check: tvd_num = Σ|n_cv·N − g_v·n_c|, tvd = num/(2·n_c·N)."""
    from bigquery_postgres_events_etl_spark.registry import all_queries

    rows = []
    # cohort (en, bucket 0): 4 docs, 2 src0 + 2 src1 — mirrors global
    for i in range(2):
        rows.append((i, "en", 10, "src0", "x"))
        rows.append((10 + i, "en", 10, "src1", "x"))
    # cohort (de, bucket 0): 4 docs, ALL src0 — maximally skewed
    for i in range(4):
        rows.append((20 + i, "de", 10, "src0", "x"))
    # balance the corpus: 4 more src1 docs in a third cohort
    for i in range(4):
        rows.append((30 + i, "fr", 10, "src1", "x"))
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long, source string, text string"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        (r.lang, r.len_bucket): r
        for r in all_queries()["dq_t_closeness"](spark, str(tmp_path)).collect()
    }
    # global: 6 src0 / 6 src1 over N=12
    en = out[("en", 0)]
    assert en.tvd == 0.0 and not en.violates_t
    de = out[("de", 0)]
    # |4·12 − 6·4| + |0·12 − 6·4| = 24 + 24 = 48; tvd = 48/(2·4·12) = 0.5
    assert de.tvd_num == 48 and abs(de.tvd - 0.5) < 1e-12
    assert de.violates_t
