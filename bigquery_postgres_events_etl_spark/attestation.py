"""Attestation-driven driver rotation.

The driver's correctness gate samples the FIRST 50 registry entries
each round (registration order as exposed by ``registry.all_queries``).
For that sample to attest the *staleness frontier* — never-attested
entries first, then the oldest green attestations — the ordering must
track the recorded ``CORRECTNESS_r*.json`` history.

Through round 5 this rotation was a hand-maintained 140-line list in
``registry.py`` whose invariants lived in comments; the r5 verdict
(item #8) asked for it to be DERIVED from the attestation data at
import time with the invariants pytest-pinned. This module is that
derivation; ``tools/attestation_report.py`` reuses it for the human
report.

Ordering key, oldest-first (stable within a tier by registration
order, so the plan is deterministic):

1. never-attested entries (no green driver row in any round — a red
   hash-fail row does NOT count as attested);
2. entries whose physical plan changed since their freshest green row
   (hand-flagged in ``PLAN_CHANGED_REATTEST`` by the change author —
   plan-hashing at import time would require building every DataFrame,
   ~minutes of Spark work before the first query runs);
3. everything else by freshest green round, oldest first.
"""

from __future__ import annotations

import glob
import json
import os
import re

# Entries whose physical plan changed since their last green driver
# row. The ONLY hand-maintained piece of the rotation: add a name here
# in the same commit that changes its plan; remove it once a newer
# CORRECTNESS round shows it green.
#
# The value is the FIRST ROUND THAT MUST RE-ATTEST the new plan —
# i.e. (round whose driver gate will next see the change) — NOT the
# round the change was authored in. The distinction matters exactly
# when a change lands after a round's driver run: flagging with that
# round's own number would let a same-round green row (which attested
# the OLD plan) silently supersede the flag (the r6 ADVICE edge). A
# green row from a round >= the flagged value supersedes the flag
# automatically; anything older keeps the entry on the 0.5 tier.
#
# Session-conf scope note (r14 ADVICE): a session-wide conf that
# changes physical plans in bulk (e.g. the r14
# canChangeCachedPlanOutputPartitioning flip, which touches every
# entry that persists a shuffled sliver) is NOT flagged per-entry
# here — the flag list is for targeted rewrites; conf-induced plan
# changes are instead verified by the full-registry oracle sweeps at
# sf0.001/0.01/0.1 recorded in ORACLE_SF01_FULL_r*.md (0 failures),
# which cover every entry at once rather than rotating 50 at a time.
#
# r7 flags (17 entries, shared-shingle / scan-tail campaigns) were all
# re-attested green in CORRECTNESS_r07 and removed; likewise every r8
# flag (11 entries) attested green in CORRECTNESS_r08, and every r9
# flag (9 entries: LSH/MMR/recall/BPE oracle conversions, jaccard-est
# + entity-resolve shared-frame rewrites, pagerank broadcast path) in
# CORRECTNESS_r09. r10 flags (authored before the r10 driver gate):
PLAN_CHANGED_REATTEST: dict[str, int] = {
    # name -> first round that must re-attest the new plan
    # (r10 flags — LPA oracle conversion, pagerank adjacency rewrite,
    # markov driver tail — attested green in CORRECTNESS_r10 and
    # removed; the r11 flag graph_pagerank_copurchase attested in
    # CORRECTNESS_r11; the r12 flags ml_logreg_train,
    # dedup_lsh_recall_report, embedding_power_iteration attested in
    # CORRECTNESS_r12 — all pruned; all eleven r13 flags — the r12
    # narrowed-persist trio, the NULLIF hardenings, the fused-Viterbi
    # pair, the BPE empty-token pair, the funnel zero-traffic pair —
    # attested green in CORRECTNESS_r13 and pruned.)
    # r14 fused-kernel rewrite (r13 verdict item 6 — the per-round
    # N·k crossJoin/groupBy + N·d posexplode shuffles replaced by one
    # Arrow mapInPandas pass emitting k·d partial sums; semantics
    # bit-identical — Lloyd parity pytest + oracle green at sf0.001/
    # sf0.01 — but the physical plan is new; AB interleave measured
    # 5.91 → 2.25 s pooled median at sf0.1):
    "ml_kmeans_train_q8": 14,
    # r14 single-level-vocabulary NULLIF hardening (a one-event-type
    # partition crashed Spark ANSI DIVIDE_BY_ZERO in all three —
    # caught by the r14 sweep probes; values identical on
    # non-degenerate data, re-attest once — the r13 funnel class):
    "events_ks_test": 14,
    "stats_mann_whitney": 14,
    "stats_chi_square_independence": 14,
    # r14 second sweep wave (one-user / constant-timestamp corpora —
    # same class, same round, same NULLIF discipline; etl_flagship is
    # the one VALUE bug: the dedup survivor tie-break ordered the
    # VARCHAR projection of event_id while the oracle bound the
    # source BIGINT — numeric order, the true first-arriving
    # semantics, now pinned on both):
    "etl_flagship": 14,
    "events_ab_ttest": 14,
    "events_ab_proportion_ztest": 14,
    "events_power_analysis": 14,
    "stats_spearman_rho": 14,
    "events_cuped_adjustment": 14,
    # r14 OPTIMIZATION-round plan rewrites (values identical — every
    # one re-proved against the DuckDB oracle at sf0.001 and sf0.01
    # in-round; see OPTIMIZATION_r14.md): tokenizer merge loops now
    # fuse per-round aggregations and argmax on the driver below a
    # cardinality gate; simhash expressions rebuilt as SQL strings
    # (same plan, but flagged with its consumers for safety);
    # markov-p4 constant-size tail runs driver-side below the channel
    # gate; HITS half-steps de-shuffled via the pre-aggregated
    # two-direction adjacency; pagerank/PPR preludes lost the deg
    # checkpoint and loop checkpoints went lazy:
    "text_wordpiece_train": 14,
    "text_wordpiece_encode_trained": 14,
    "text_bpe_train_merges": 14,
    "text_bpe_encode_trained": 14,
    "dedup_simhash": 14,
    "dedup_simhash_pairs": 14,
    "dedup_simhash_fast": 14,
    "dedup_edit_distance_banded": 14,
    "events_markov_attribution": 14,
    # r15 re-touches on r14-flagged entries: markov-p4 gained the
    # single-evaluation checkpoint + scenario dedup; the three rank
    # loops gained the hub-degree sub-gate (occ in the head aggregate)
    "events_markov_removal_p4": 15,
    "graph_pagerank_copurchase": 15,
    "graph_ppr_seeded": 15,
    "graph_hits_copurchase": 15,
    # r15 driver hash-parity fix (the r14 CORRECTNESS gate failure):
    # conformal nonconformity now reads the NB score's EXACT decimal
    # (nb_quality_score_dec) instead of re-rounding the double through
    # the engine-divergent double→decimal cast the oracle never took.
    # Values are identical wherever the old round-trip was lossless;
    # the plan changed (one fewer cast pair), so re-attest:
    "ml_eval_conformal": 15,
    # r15 iterative-loop treatment (verdict items 3/7): CC loops lost
    # the per-round convergence join (prev rides the checkpoint) and
    # gained a pre-partitioned persisted edge frame; kcore/LPA/MMR
    # checkpoints went lazy (plan text unchanged — LogicalRDD either
    # way — but flagged with their consumers per the r14 discipline):
    "dedup_dup_clusters": 15,
    "dedup_cluster_star": 15,
    "multimodal_phash_clusters": 15,
    "graph_kcore": 15,
    "graph_label_propagation": 15,
    "graph_modularity": 15,
    "similarity_mmr_topk": 15,
    # r15 expression-build fix (the r14 dedup_simhash class): minhash
    # signature/band/agreement expressions rebuilt as SQL strings —
    # plans verified bit-identical (plans/r15 diffs), flagged with
    # consumers for safety exactly as the r14 simhash flags were:
    "dedup_minhash_signatures": 15,
    "dedup_minhash_lsh": 15,
    "dedup_minhash_jaccard_est": 15,
    "dedup_entity_resolve": 15,
    "dedup_minhash_incremental": 15,
    "dedup_lsh_recall_report": 15,
}


def repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_attestations(root: str | None = None) -> tuple[dict[str, int], int]:
    """``({entry: freshest green round}, newest round seen)``.

    A row is green if it hash-matched, or was a rows-only check that
    ran without error (``err == 'no_oracle'``). Unparseable files are
    skipped (never raises — a fresh checkout with no CORRECTNESS files
    simply yields ``({}, 0)``, degrading the rotation to registration
    order)."""
    root = root or repo_root()
    freshest: dict[str, int] = {}
    newest = 0
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        newest = max(newest, rnd)
        try:
            with open(path) as f:
                data = json.load(f)
        except Exception:
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            ok = row.get("hash_match") is True or row.get("err") == "no_oracle"
            if ok:
                freshest[name] = max(freshest.get(name, 0), rnd)
    return freshest, newest


def effective_round(name: str, freshest: dict[str, int]) -> float:
    """The staleness key: 0 = never attested, 0.5 = attested but the
    plan changed since (re-attest ahead of every ordinary refresh),
    else the freshest green round.

    ``rnd < flagged`` is exact under the flag convention above: the
    flag IS the first round that may attest the new plan, so any green
    row from an earlier round attested the old plan and is stale."""
    rnd = freshest.get(name, 0)
    if rnd == 0:
        return 0.0
    flagged = PLAN_CHANGED_REATTEST.get(name)
    if flagged is not None and rnd < flagged:
        return 0.5
    return float(rnd)


def driver_priority(
    names: list[str],
    root: str | None = None,
    has_oracle: set[str] | frozenset[str] | None = None,
) -> list[str]:
    """The full registry ordering: sort ``names`` by staleness key,
    stable (remaining ties keep registration order).

    When ``has_oracle`` is given, entries WITH a hash oracle order
    ahead of rows-only entries of EQUAL staleness: the driver records
    ``err: no_oracle`` for rows-only entries (no hard signal), so a
    driver slot spent on one buys less than the same slot spent on a
    hash-checkable entry that is just as stale. The staleness tiers
    themselves are untouched — a never-attested rows-only entry still
    fronts every merely-old hash-checked one."""
    freshest, _ = load_attestations(root)
    if has_oracle is None:
        return sorted(names, key=lambda n: effective_round(n, freshest))
    return sorted(
        names,
        key=lambda n: (effective_round(n, freshest), 0 if n in has_oracle else 1),
    )
