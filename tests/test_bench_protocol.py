"""Contracts of the official bench harness (bench.py).

bench.py is driver-critical: a malformed or over-long final line loses
the round's official perf record (it happened in r5 — 2,971-byte line
truncated by the driver's ~2,000-byte stdout tail — and nearly again
in r6 via an assert placed before the print). These tests pin the
protocol pieces that do not need a SparkSession: the previous-round
reference loader, the mover-flagging trigger, and the final-line size
budget under worst-case numbers.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_median_even_and_odd():
    assert bench._median([3.0, 1.0, 2.0]) == 2.0
    assert bench._median([4.0, 1.0, 2.0, 3.0]) == 2.5


def test_previous_round_parses_committed_reference_files():
    """The trigger compares against the newest BENCH_r*.json (driver
    format: medians under "parsed") and the committed BENCH_DETAIL.json
    spreads; both exist in the repo from round 8 onward.

    HEADLINE is frozen since r1, so every headline query must have an
    official median on record. TIER2 may gain queries mid-round (the
    r11 composition change); a newcomer legitimately has no previous
    median — _flag_movers skips it — so tier-2 coverage is asserted
    only for the majority that predates the newest record."""
    root = os.path.dirname(os.path.abspath(bench.__file__))
    med, spread = bench._previous_round(root)
    for name in bench.HEADLINE:
        assert name in med, name
        assert med[name] > 0
    covered = [n for n in bench.TIER2 if n in med]
    # exact drift guard (r11 ADVICE: a 50% blanket let half the medians
    # vanish silently): a TIER2 name may be uncovered ONLY if it is
    # genuinely absent from the newest record's raw text (a newcomer).
    # A name present in the file but not in the parsed medians means
    # the parser dropped it — that IS drift, fail loudly.
    import glob as _glob
    import re as _re

    numbered = sorted(
        (int(m.group(1)), p)
        for p in _glob.glob(os.path.join(root, "BENCH_r*.json"))
        if (m := _re.search(r"r(\d+)\.json$", os.path.basename(p)))
    )
    with open(numbered[-1][1]) as f:
        raw = f.read()
    dropped = [n for n in bench.TIER2 if n not in med and f'"{n}"' in raw]
    assert not dropped, (
        f"parser drift: {dropped} present in {numbered[-1][1]} but "
        "missing from bench._previous_round medians"
    )
    for name in covered:
        assert med[name] > 0
    # spreads come from the sidecar (may legitimately be a subset)
    assert spread, "BENCH_DETAIL.json yielded no spreads"


def test_previous_round_degrades_to_empty_on_missing_files(tmp_path):
    med, spread = bench._previous_round(str(tmp_path))
    assert med == {} and spread == {}


def test_flag_movers_triggers_only_past_noise():
    prev = {"a": 1.0, "b": 1.0, "c": 1.0, "new_entry_absent": 1.0}
    spreads = {"a": 0.5, "b": 0.05, "c": 0.05}
    runs = {
        "a": [1.3] * 5,          # delta 0.3 < prev spread 0.5 -> not flagged
        "b": [1.3] * 5,          # delta 0.3 > all noise terms -> flagged
        "c": [1.02] * 5,         # delta 0.02 < 50 ms floor -> not flagged
        "d": [9.9] * 5,          # no previous record -> not flagged
    }
    assert bench._flag_movers(runs, prev, spreads) == ["b"]


def test_flag_movers_own_spread_absorbs_delta():
    # own-run spread larger than the delta: wobbly query, no re-run
    runs = {"a": [0.5, 1.0, 1.5, 2.0, 2.5]}  # median 1.5, spread 2.0
    assert bench._flag_movers(runs, {"a": 1.0}, {}) == []


def test_flag_movers_caps_at_strongest_movers():
    prev = {f"q{i}": 1.0 for i in range(20)}
    # every query moved; mover strength grows with i
    runs = {f"q{i}": [1.0 + 0.1 * (i + 1)] * 5 for i in range(20)}
    flagged = bench._flag_movers(runs, prev, {})
    assert len(flagged) == 8
    assert flagged[0] == "q19"  # strongest delta/noise first
    assert set(flagged) == {f"q{i}" for i in range(12, 20)}


def test_final_line_fits_driver_tail_window_worst_case():
    """The driver records only the LAST ~2,000 bytes of stdout; the
    final line must stay under bench.py's own 1,500-byte guard even
    with worst-plausible widths (4-digit seconds, 3 decimals) for
    every query."""
    worst = 9999.999
    line = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": worst * len(bench.HEADLINE),
            "unit": "sec",
            "queries": {q: worst for q in bench.HEADLINE},
            "value2": worst * len(bench.TIER2),
            "queries2": {q: worst for q in bench.TIER2},
            "value_min": worst * len(bench.HEADLINE),
            "value2_min": worst * len(bench.TIER2),
            "sf": 0.1,
        }
    )
    assert len(line) < 1500, len(line)
