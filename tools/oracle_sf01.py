"""Standing sf0.1 oracle tier for the decimal/ln-hazard cohort.

r12 verdict item 4: the entries whose cross-engine exactness rests on
the decimal-sum / floored-ln disciplines are exactly the ones where a
divergence historically surfaced only at LARGER scale (more rows →
more chances for a value to land near a rounding boundary). This tool
re-runs their full hash-oracle check at sf0.1 every round close and
the result is committed as ``ORACLE_SF01_r{N}.md``.

Usage: python tools/oracle_sf01.py [round_number]
       (writes ORACLE_SF01_r{N}.md in the repo root when a round
        number is given; always prints the per-entry lines)
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The decimal/ln-hazard cohort: every entry with a floor(ln·scale)
# cost, a decimal-rounded contribution sum, or a survival/rate chain
# whose boundary could flip engines. Grown, never shrunk.
COHORT = [
    "text_bm25_topk",
    "events_wilson_ci",
    "events_psi_drift",
    "events_ewma_halflife",
    "customer_survival_km",
    "stats_logrank_test",
    "stats_anova_oneway",
    "ml_eval_ece",
    "ml_eval_ndcg_bm25",
    "ml_eval_mrr_bm25",
    "graph_adamic_adar",
    "text_unigram_lm_train",
    "text_unigram_encode_trained",
    "pipeline_doremi_weights",
    "ml_eval_avg_precision_nb",
    "pipeline_learnability_select",
    # r14: WordPiece rides the ln-free integer-score chain but shares
    # the tokenizer decimal surface; mSPRT compares decimal-string-
    # converted IEEE chains; conformal compares an exact-decimal
    # quantile — all three are exactly the class this tier exists for
    "text_wordpiece_train",
    "text_wordpiece_encode_trained",
    "events_ab_sequential",
    "ml_eval_conformal",
]


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else None
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"),
         "/root/testdata/sf0.1", *COHORT],
        capture_output=True, text=True, cwd=REPO,
    )
    lines = [
        ln for ln in proc.stdout.splitlines()
        if ln.startswith(("OK", "FAIL", "ok?", "WARN")) or "failures" in ln
    ]
    print("\n".join(lines))
    if rnd is not None:
        path = os.path.join(REPO, f"ORACLE_SF01_r{rnd}.md")
        with open(path, "w") as f:
            f.write(
                f"# sf0.1 decimal-hazard oracle tier — round {rnd}\n\n"
                "Full hash-oracle check (tools/check_oracle.py) of the\n"
                "decimal/ln-sensitive cohort at sf0.1 "
                f"(exit {proc.returncode}):\n\n```\n"
                + "\n".join(lines) + "\n```\n"
            )
        print(f"wrote {path}")
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
