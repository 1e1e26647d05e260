"""Physical-plan auditing — the "would this survive 100×?" checks.

The reference gets its optimizations by SQL construction (SURVEY §4);
here Catalyst provides them, and this module makes the outcome
*assertable*: tests and tooling can verify a filter actually reached
the parquet scan, a dim actually broadcast, and the exchange count
matches the design — instead of trusting that it probably did.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def plan_summary(df: DataFrame) -> dict:
    """Counts of the plan features that matter at scale.

    Operators are counted from the formatted-explain detail headers
    (``(N) OpName``) so each physical node counts exactly once (the
    tree rendering repeats every name)."""
    fp = formatted_plan(df)
    ops = re.findall(r"^\(\d+\) (.+?)(?: \[codegen id : \d+\])?\s*$", fp, re.M)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", fp)
    partition_filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", fp)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", fp)

    def n(op: str) -> int:
        return sum(1 for o in ops if o.strip().startswith(op))

    return {
        "exchanges": n("Exchange"),
        "broadcast_hash_joins": n("BroadcastHashJoin"),
        "sort_merge_joins": n("SortMergeJoin"),
        "shuffled_hash_joins": n("ShuffledHashJoin"),
        "nested_loop_joins": n("BroadcastNestedLoopJoin"),
        "scans": n("Scan parquet"),
        "bucketed_scans": fp.count("Bucketed: true"),
        "pushed_filters": [p for p in pushed if p.strip()],
        "partition_filters": [p for p in partition_filters if p.strip()],
        "scan_columns": [len(s.split(",")) for s in schemas],
        "take_ordered": "TakeOrderedAndProject" in fp,
    }


def has_pushed_filter(df: DataFrame, column: str) -> bool:
    """True if any parquet scan received a pushed filter on ``column``."""
    return any(column in p for p in plan_summary(df)["pushed_filters"])


def scan_is_pruned(df: DataFrame, max_columns: int) -> bool:
    """True if every parquet scan reads at most ``max_columns`` columns
    (column pruning reached the source)."""
    cols = plan_summary(df)["scan_columns"]
    return bool(cols) and all(c <= max_columns for c in cols)
