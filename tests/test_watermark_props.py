"""Hypothesis property tests for the watermark store (ST1/ST2/ST4):
the invariants hold for arbitrary write sequences, not just the
examples in test_incremental."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from bigquery_postgres_events_etl_spark.sources.watermark import (
    read_watermark_us,
    write_watermark_us,
)

NOW_US = 1_706_655_976_220_708


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**60), min_size=1, max_size=20))
def test_watermark_is_running_max(tmp_path_factory, values):
    """After any write sequence the stored value is exactly the
    running max, and each write reports advancement iff it moved."""
    path = str(tmp_path_factory.mktemp("wm") / "wm.txt")
    running_max = None
    for v in values:
        advanced = write_watermark_us(path, v)
        expected_advance = running_max is None or v > running_max
        assert advanced == expected_advance
        running_max = v if expected_advance else running_max
        assert read_watermark_us(path, 1, now_us=NOW_US) == running_max


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=1, max_value=10_000))
def test_lookback_fallback_formula(tmp_path_factory, hours):
    """Missing state ⇒ exactly now − hours (ST2)."""
    path = str(tmp_path_factory.mktemp("wm") / "missing.txt")
    assert (
        read_watermark_us(path, hours, now_us=NOW_US)
        == NOW_US - hours * 3600 * 1_000_000
    )
