"""Scalar column expressions (SURVEY §2.8 X1-X6, §2.2 P2).

Everything here is a built-in Catalyst expression — whole-stage
codegen'd, vectorized, zero Python UDFs. At 100 TB this is the
difference between JVM-side columnar evaluation and a Python
serialization wall.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------
# X1 — multi-format date parsing (reference: extract_bq.py:278-288
# tries %Y-%m-%d, %Y/%m/%d, %d-%m-%Y, %d/%m/%Y in order, errors if none
# match; here NULL if none match — callers may .isNotNull()-assert).
_DATE_FORMATS = ["yyyy-MM-dd", "yyyy/MM/dd", "dd-MM-yyyy", "dd/MM/yyyy"]


def parse_date_multi(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(fmt)).cast("date") for fmt in _DATE_FORMATS])


# X2 — date → BigQuery shard suffix (reference: extract_bq.py:99-100)
def to_shard_suffix(col: Column | str) -> Column:
    return F.date_format(col, "yyyyMMdd")


# X4 — µs-epoch ↔ timestamp (reference: flask_server.py:66,96,213,256)
def micros_to_ts(col: Column | str) -> Column:
    return F.timestamp_micros(F.col(col) if isinstance(col, str) else col)


def ts_to_micros(col: Column | str) -> Column:
    return F.unix_micros(F.col(col) if isinstance(col, str) else col)


# ---------------------------------------------------------------------
# P2 — nested event_params extraction.
#
# Struct variant (exact reference parity): the reference's Python loop
# keeps the LAST matching param — no break (extract_bq.py:159-164) —
# so we take element_at(filter(...), -1), not [0].
def param_last_wins(params_col: str, key: str) -> Column:
    # try_element_at: NULL (not an ANSI error) when no param matches
    return F.try_element_at(
        F.expr(f"filter({params_col}, p -> p.key = '{key}')"), F.lit(-1)
    )["value"]["string_value"]


# JSON-string variant (fixture `events.props` is a JSON string).
def json_param(props_col: Column | str, key: str) -> Column:
    c = F.col(props_col) if isinstance(props_col, str) else props_col
    return F.get_json_object(c, f"$.{key}")


# ---------------------------------------------------------------------
# Exact double aggregation: SUM over doubles is order-dependent in any
# parallel engine, which breaks bit-exact comparison against the DuckDB
# oracle. Casting each addend to DECIMAL makes the sum exact and
# order-independent; the final cast back to double is a single
# deterministic IEEE rounding. Per-row double arithmetic (the addend
# expression itself) is deterministic IEEE-754 and matches across
# engines. Cost at scale: decimal aggregation is marginally slower than
# double but still JVM-side, codegen'd, and partial-aggregatable.
def dsum(col: Column | str, alias: str, scale: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(27,{scale})")).cast("double").alias(alias)


def davg(col: Column | str, alias: str, scale: int = 4) -> Column:
    """Exact-sum average: decimal sum → double, divided by count.

    One IEEE division at the end — deterministic across engines.
    Oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(27,s))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(27,{scale})")).cast("double") / F.count(c)
    ).alias(alias)
