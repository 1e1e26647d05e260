"""Watermark-store + incremental-runner property tests (ST1-ST8)."""

from __future__ import annotations

from bigquery_postgres_events_etl_spark.sources.watermark import (
    read_watermark_us,
    write_watermark_us,
)
from bigquery_postgres_events_etl_spark.streaming.incremental import (
    run_incremental_etl,
)

NOW_US = 1706655976220708  # fixture max ts (2024-01-30 23:26:16.220708)
EARLY_US = 1704067200000000  # 2024-01-01 00:00:00


def test_lookback_fallback(tmp_path):
    """ST2: missing state → now − lookback (flask_server.py:63-68)."""
    p = str(tmp_path / "wm.txt")
    assert read_watermark_us(p, lookback_hours=24, now_us=NOW_US) == NOW_US - 24 * 3600 * 1_000_000


def test_corrupt_state_falls_back(tmp_path):
    p = tmp_path / "wm.txt"
    p.write_text("not-a-number")
    assert read_watermark_us(str(p), 1, now_us=NOW_US) == NOW_US - 3600 * 1_000_000


def test_watermark_monotonic(tmp_path):
    """ST4: the watermark only moves forward."""
    p = str(tmp_path / "wm.txt")
    assert write_watermark_us(p, 100)
    assert not write_watermark_us(p, 50)
    assert not write_watermark_us(p, 100)
    assert read_watermark_us(p, 1, now_us=NOW_US) == 100
    assert write_watermark_us(p, 200)
    assert read_watermark_us(p, 1, now_us=NOW_US) == 200


def test_incremental_run_and_idempotent_rerun(spark, sf_dir, tmp_path):
    """ST3: a replay (crash-before-advance) inserts nothing new; a
    normal second run sees no rows above the advanced watermark."""
    state = str(tmp_path / "wm.txt")
    target = str(tmp_path / "target")
    write_watermark_us(state, EARLY_US + 15 * 24 * 3600 * 1_000_000)  # mid-window

    r1 = run_incremental_etl(spark, sf_dir, state, target, now_us=NOW_US)
    assert r1["status"] == "success"
    assert r1["records_inserted"] == r1["records_fetched"] > 0
    assert r1["watermark_advanced"]

    # crash-before-advance replay: the watermark never advanced past
    # its pre-run value, so the identical batch is re-fetched — the
    # idempotent sink must drop every replayed row
    write_watermark_us(state + ".reset", EARLY_US + 15 * 24 * 3600 * 1_000_000)
    r2 = run_incremental_etl(
        spark, sf_dir, state + ".reset", target, now_us=NOW_US
    )
    assert r2["status"] == "success"
    assert r2["records_fetched"] == r1["records_fetched"]
    assert r2["records_inserted"] == 0  # all dupes anti-joined away

    # normal incremental rerun: watermark advanced → nothing new
    r3 = run_incremental_etl(spark, sf_dir, state, target, now_us=NOW_US)
    assert r3["records_fetched"] == 0
    assert r3["records_inserted"] == 0
    assert not r3["watermark_advanced"]


def test_error_lands_in_status(spark, tmp_path):
    """ST8: failures are reported in the status record, not raised
    (flask_server.py:223-229)."""
    r = run_incremental_etl(
        spark, "/nonexistent/dir", str(tmp_path / "wm"), str(tmp_path / "t")
    )
    assert r["status"] == "error"
    assert "error" in r
