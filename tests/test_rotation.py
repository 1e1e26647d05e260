"""Driver-rotation invariants (r5 verdict item #8).

Through r5 the driver sample order was a hand-maintained list whose
invariants lived in comments; one mis-ordered insert silently wasted
driver attestation slots. The order is now derived from the recorded
CORRECTNESS_r*.json history (attestation.driver_priority); these tests
pin the invariants that used to be prose.

No SparkSession needed — the rotation is pure registry + JSON."""

from __future__ import annotations

import json

from bigquery_postgres_events_etl_spark import attestation
from bigquery_postgres_events_etl_spark.registry import all_queries


def _names_and_freshest():
    names = list(all_queries().keys())
    freshest, newest = attestation.load_attestations()
    return names, freshest, newest


def test_front_50_is_exactly_the_staleness_frontier():
    """The driver samples the first 50 of all_queries(): they must be
    the 50 entries with the smallest staleness key (never-attested
    first, then plan-changed re-attests, then oldest green round)."""
    names, freshest, newest = _names_and_freshest()
    if newest == 0:
        return  # fresh checkout: fallback order, nothing to pin
    keys = {n: attestation.effective_round(n, freshest) for n in names}
    front, rest = names[:50], names[50:]
    worst_front = max(keys[n] for n in front)
    best_rest = min(keys[n] for n in rest)
    assert worst_front <= best_rest, (
        f"a fresher entry (key {worst_front}) sits in the front-50 while "
        f"a staler one (key {best_rest}) waits outside"
    )


def test_no_attested_entry_precedes_a_never_attested_one():
    names, freshest, newest = _names_and_freshest()
    if newest == 0:
        return
    seen_attested = False
    for n in names:
        k = attestation.effective_round(n, freshest)
        if k > 0:
            seen_attested = True
        elif seen_attested:
            raise AssertionError(
                f"never-attested {n!r} ordered after an attested entry"
            )


def test_order_is_deterministic_and_stable_within_tier():
    """Same inputs → same order; ties (same staleness key) keep
    registration order, so the plan is reproducible across sessions."""
    names, freshest, newest = _names_and_freshest()
    a = attestation.driver_priority(names)
    b = attestation.driver_priority(names)
    assert a == b
    reg_index = {n: i for i, n in enumerate(names)}
    keys = {n: attestation.effective_round(n, freshest) for n in names}
    for x, y in zip(a, a[1:]):
        if keys[x] == keys[y]:
            # NOTE: `names` here is all_queries() order, which is the
            # rotated order itself — stability within a tier means the
            # rotated order is a fixed point, i.e. re-deriving doesn't
            # reshuffle equal-key entries.
            assert reg_index[x] < reg_index[y]


def test_plan_changed_flags_front_ahead_of_ordinary_refreshes():
    """A flagged plan change must re-attest before any merely-stale
    green entry, but never displace a never-attested entry."""
    names, freshest, newest = _names_and_freshest()
    if newest == 0:
        return
    order = attestation.driver_priority(names)
    pos = {n: i for i, n in enumerate(order)}
    flagged_live = [
        n
        for n, flag_rnd in attestation.PLAN_CHANGED_REATTEST.items()
        if n in pos and 0 < freshest.get(n, 0) < flag_rnd
    ]
    never = [n for n in names if freshest.get(n, 0) == 0]
    plainly_attested = [
        n
        for n in names
        if freshest.get(n, 0) > 0
        and attestation.effective_round(n, freshest) >= 1
    ]
    for f in flagged_live:
        assert all(pos[f] < pos[p] for p in plainly_attested), f
        assert all(pos[f] > pos[nv] for nv in never), f


def test_rows_only_entries_order_behind_hash_checked_peers():
    """r6 verdict item #8: within one staleness tier, entries WITHOUT a
    hash oracle (the driver records only `err: no_oracle` for them — a
    slot with no hard signal) must come after hash-checkable ones, so
    driver slots prefer entries the driver can actually verify."""
    from bigquery_postgres_events_etl_spark.registry import all_oracles

    names, freshest, newest = _names_and_freshest()
    if newest == 0:
        return
    oracles = set(all_oracles())
    keys = {n: attestation.effective_round(n, freshest) for n in names}
    for x, y in zip(names, names[1:]):
        if keys[x] == keys[y]:
            assert not (x not in oracles and y in oracles), (
                f"rows-only {x!r} precedes hash-checked {y!r} in tier {keys[x]}"
            )


def test_tiebreaker_never_crosses_staleness_tiers():
    """The oracle tiebreaker must not promote a fresh hash-checked
    entry over a staler rows-only one — staleness always dominates."""
    import json as _json
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "CORRECTNESS_r3.json"), "w") as f:
            _json.dump({"fresh_hash": {"hash_match": True}}, f)
        order = attestation.driver_priority(
            ["fresh_hash", "stale_rows_only"], d, has_oracle={"fresh_hash"}
        )
        assert order == ["stale_rows_only", "fresh_hash"]


def test_red_rows_do_not_count_as_attested(tmp_path):
    """A hash-fail driver row must leave the entry on the never tier
    (the r5 pipeline_weighted_sample red row put it at position 1 of
    the r6 frontier — exactly right)."""
    (tmp_path / "CORRECTNESS_r9.json").write_text(
        json.dumps(
            {
                "green_hash": {"hash_match": True, "err": None},
                "green_rows_only": {"hash_match": None, "err": "no_oracle"},
                "red_hash": {
                    "hash_match": False,
                    "rows_match": True,
                    "schema_match": True,
                    "err": None,
                },
                "red_error": {"hash_match": None, "err": "boom"},
            }
        )
    )
    freshest, newest = attestation.load_attestations(str(tmp_path))
    assert newest == 9
    assert freshest == {"green_hash": 9, "green_rows_only": 9}
    order = attestation.driver_priority(
        ["green_hash", "green_rows_only", "red_hash", "red_error"],
        str(tmp_path),
    )
    assert order[:2] == ["red_hash", "red_error"]


def test_fresh_checkout_degrades_gracefully(tmp_path):
    freshest, newest = attestation.load_attestations(str(tmp_path))
    assert (freshest, newest) == ({}, 0)
    assert attestation.driver_priority(["b", "a"], str(tmp_path)) == ["b", "a"]


def test_rows_only_registrations_carry_inline_reason():
    """Discipline lint: a rows-only registration (`@register(name,
    None)`) is a claim that no DuckDB twin can exist — the claim must
    be stated inline (`# reason`) at the registration site so every
    reviewer sees WHY the driver gets no hard signal for that entry,
    and so the rows-only tier can't quietly grow with undocumented
    entries."""
    import glob
    import os
    import re

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bigquery_postgres_events_etl_spark",
    )
    offenders = []
    # whole-file regex so MULTI-LINE registrations can't evade the
    # lint; the reason must sit after the closing paren of the
    # registration (same line as the `None)`)
    pat = re.compile(r"@register\(\s*\"[^\"]+\"\s*,\s*None\s*,?\s*\)", re.DOTALL)
    for path in glob.glob(os.path.join(root, "**", "*.py"), recursive=True):
        text = open(path).read()
        for m in pat.finditer(text):
            rest_of_line = text[m.end():].split("\n", 1)[0]
            if "#" not in rest_of_line:
                line_no = text.count("\n", 0, m.start()) + 1
                offenders.append(f"{os.path.relpath(path, root)}:{line_no}")
    assert not offenders, (
        f"rows-only registrations without an inline reason: {offenders}"
    )
