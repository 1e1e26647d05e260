"""Query registry — the oracle-checked operator surface.

Every operator from SURVEY §2 (plus the query-layer and LLM-pipeline
operators) registers here as a named (spark_fn, oracle_sql) pair. The
driver runs the Spark side and the DuckDB side at sf0.01 and compares
row-count + schema + order-insensitive value-hash.

Conventions that make the hashes match:
- every computed column is aliased identically on both sides;
- double aggregations go through exact DECIMAL sums (functions.scalars
  dsum/davg) — order-independent, bit-exact across engines;
- window/dedup survivors are made deterministic with explicit
  tie-break ordering;
- fixture ``events.ts`` is parquet TIMESTAMP(NANOS): Spark reads int64
  nanos (io.load_table converts to µs TimestampType), the oracle uses
  ``CAST(ts AS TIMESTAMP)`` — identical µs truncation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QuerySpec = tuple[Callable[[SparkSession, str], DataFrame], str | None]

_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under
    ``name`` with its DuckDB oracle SQL (None → rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {k: v[0] for k, v in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        queries_etl,
        queries_relational,
        queries_window,
        queries_temporal,
        queries_dedup,
        queries_similarity,
        queries_text,
        queries_multimodal,
        queries_sql,
        queries_scalars,
        queries_stats,
        queries_skew,
        queries_agg2,
        queries_misc,
        queries_tpch,
        queries_analytics,
    )

    _LOADED = True
