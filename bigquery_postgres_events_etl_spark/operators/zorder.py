"""Z-order (Morton-curve) clustering for multi-dimensional data
skipping — what Delta's OPTIMIZE ZORDER BY / Iceberg's sort-order
rewrite do for a lakehouse table, expressed as plain Spark.

A range-partitioned sort on ONE column gives perfect file-level
min/max pruning on that column and none on any other: every file
spans the full domain of the second column, so a point predicate on
it must read every file. Interleaving the bits of both (min-max
scaled) columns and range-partitioning on the interleaved value makes
each output file cover a compact axis-aligned region of the 2-D key
space — a point predicate on EITHER column overlaps only ~√n_files of
the per-file [min, max] envelopes, which is exactly the statistic a
format with file-level stats (parquet row-group pruning, Delta/
Iceberg data skipping) uses to drop files unread.

All arithmetic is integer (scale → spread → interleave), JVM-side,
map-only; the only non-map step is the one-row min/max frame and the
final range partitioning (a sample + shuffle — the same cost as any
global sort, run once at write time to save every later read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

# Morton spread of a 16-bit int into the even bits of a 32-bit int —
# the classic shift-or-mask ladder; identical integer ops in DuckDB.
_SPREAD_STEPS = [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)]


def _spread_sql(expr: str) -> str:
    for shift, mask in _SPREAD_STEPS:
        expr = f"(({expr}) | (({expr}) * {1 << shift})) & {mask}"
        # NOTE: multiplication by 2^s instead of a shift operator keeps
        # the expression text valid in BOTH Spark SQL and DuckDB
        # (Spark has shiftleft() but no << operator; integer * is
        # exact in both engines at these widths).
    return expr


def _scale_sql(col: str, lo: str, hi: str, bits: int = 16, div: str = "div") -> str:
    """Min-max scale an integer column to [0, 2^bits - 1] with exact
    integer arithmetic, degenerating to 0 when hi == lo. ``div`` is
    the engine's integer-division operator — Spark spells it ``div``,
    DuckDB ``//`` (both floor exactly on non-negative operands; a
    portable ``/`` would round in doubles)."""
    top = (1 << bits) - 1
    return (
        f"CAST(CASE WHEN {hi} = {lo} THEN 0 "
        f"ELSE (({col} - {lo}) * {top}) {div} ({hi} - {lo}) END AS BIGINT)"
    )


def morton_z(x_scaled: str, y_scaled: str) -> str:
    """Interleave two 16-bit-scaled values: x in even bits, y odd."""
    return f"({_spread_sql(x_scaled)}) + 2 * ({_spread_sql(y_scaled)})"


def zorder_index(
    df: DataFrame, x_col: str, y_col: str, id_cols: list[str]
) -> DataFrame:
    """Per-row Morton z-value over two integer dimensions, scaled by
    the global min/max (one-row stats frame, broadcast back)."""
    stats = df.agg(
        F.min(x_col).cast("bigint").alias("x_lo"),
        F.max(x_col).cast("bigint").alias("x_hi"),
        F.min(y_col).cast("bigint").alias("y_lo"),
        F.max(y_col).cast("bigint").alias("y_hi"),
    )
    zx = _scale_sql(x_col, "x_lo", "x_hi")
    zy = _scale_sql(y_col, "y_lo", "y_hi")
    return df.crossJoin(F.broadcast(stats)).select(
        *id_cols,
        F.expr(zx).alias("zx"),
        F.expr(zy).alias("zy"),
        F.expr(morton_z(zx, zy)).alias("zval"),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 8,
) -> None:
    """Cluster a table on the z-curve of (x_col, y_col) and write
    ``n_files`` parquet files: each file's footer then carries tight
    min/max envelopes on BOTH columns, so any stats-aware reader
    prunes on either dimension. The z columns are dropped before the
    write — clustering changes layout, not schema."""
    with_z = zorder_index(df, x_col, y_col, df.columns)
    (
        with_z.repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .drop("zx", "zy", "zval")
        .write.mode("overwrite")
        .parquet(path)
    )


@register(
    "events_zorder_index",
    f"""
    WITH base AS (
      SELECT event_id, user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 60000000 AS ts_min
      FROM events WHERE user_id IS NOT NULL
    ),
    s AS (SELECT min(user_id) AS x_lo, max(user_id) AS x_hi,
                 min(ts_min) AS y_lo, max(ts_min) AS y_hi FROM base)
    SELECT event_id,
           {_scale_sql('user_id', 'x_lo', 'x_hi', div='//')} AS zx,
           {_scale_sql('ts_min', 'y_lo', 'y_hi', div='//')} AS zy,
           {morton_z(_scale_sql('user_id', 'x_lo', 'x_hi', div='//'),
                     _scale_sql('ts_min', 'y_lo', 'y_hi', div='//'))} AS zval
    FROM base, s
    """,
)
def events_zorder_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering key over (user_id, event minute): the exact
    integer scale→spread→interleave ladder both engines compute
    bit-identically. The write-side twin (`write_zordered`) range-
    partitions on this value; tests/test_zorder.py measures the
    file-skipping win from the resulting footer stats."""
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.expr("unix_micros(ts) div 60000000").alias("ts_min"),
        )
    )
    return zorder_index(e, "user_id", "ts_min", ["event_id"])
