"""Distributed global ranking — the two-pass replacement for
unpartitioned windows.

An ``ORDER BY`` window with no ``PARTITION BY`` moves every row to a
single reducer (Spark logs "No Partition Defined for Window operation"
and `WindowExec` runs on one task) — fine on a constant-size dim,
fatal on anything that scales with the data. Supplier scales at
10k×SF rows, so the rank/distribution queries over it need the
scalable shape:

1. range-repartition on the sort key (equal keys land in ONE
   partition, so rank/dense_rank tie groups never span partitions);
2. partition-LOCAL windows (parallel) for row_number / rank /
   dense_rank / cumulative peer counts;
3. one tiny per-partition stats table (rows, distinct keys — bounded
   by the shuffle partition count, not the data) turned into prefix
   offsets;
4. broadcast the offsets back and add: global = offset + local.

percent_rank/cume_dist/ntile derive from the exact integer
(rank, row_number, N) with the engine-portable formulas, so results
hash-match a single-window oracle bit-for-bit.

Reference semantics: the same rank()/ntile() family every SQL engine
defines; this module is about the *physical* strategy only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "_gr_pid"


def with_global_ranks(
    df: DataFrame,
    key_order: list[tuple[str, str]],
    tie_order: list[tuple[str, str]],
    num_partitions: int | None = None,
) -> DataFrame:
    """Add exact global ``rn`` (row_number over key+tie order), ``rnk``
    (rank over key order), ``drnk`` (dense_rank), ``cum_cnt`` (rows
    preceding-or-peer in key order) and ``n_total`` — without any
    unpartitioned window over the input.

    ``key_order``: the ranking ORDER BY as (column, "asc"|"desc")
    pairs (ties share a rank). ``tie_order``: extra columns making the
    total order unique (for row_number determinism).

    Skew note: all rows with one key value share a range partition; a
    corpus where one key dominates needs a pre-aggregated rank (rank
    of the *distinct* key + per-key offsets) — near-uniform numeric
    keys like acctbal are the intended use.
    """

    def _sort(cols: list[tuple[str, str]]) -> list[Column]:
        return [
            F.desc(c) if d.lower().startswith("d") else F.asc(c) for c, d in cols
        ]

    key_sort = _sort(key_order)
    full_sort = key_sort + _sort(tie_order)
    n_part = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # localCheckpoint: the range partitioner SAMPLES the input to pick
    # boundaries, and the partitioned frame is consumed twice (local
    # ranks + per-partition stats). If the exchange is not reused —
    # AQE can replan the two subtrees independently — each consumer
    # can see DIFFERENT sampled boundaries, and the stats offsets no
    # longer describe the rank pass's partitions: rn stops being a
    # permutation (observed on 60k-row lineitem: max rn 59732, gapped
    # and overlapping bucket ranges). Materializing once pins ONE set
    # of boundaries and partition ids for both consumers.
    part = (
        df.repartitionByRange(n_part, *key_sort)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )

    w_rn = Window.partitionBy(_PID).orderBy(*full_sort)
    w_key = Window.partitionBy(_PID).orderBy(*key_sort)
    # count of preceding-or-peer rows: RANGE frame over the key order
    w_cume = w_key.rangeBetween(Window.unboundedPreceding, Window.currentRow)

    local = part.select(
        "*",
        F.row_number().over(w_rn).alias("_rn_loc"),
        F.rank().over(w_key).alias("_rnk_loc"),
        F.dense_rank().over(w_key).alias("_drnk_loc"),
        F.count(F.lit(1)).over(w_cume).alias("_cum_loc"),
    )

    # per-partition stats: bounded by the partition count (a cluster
    # config constant), never by the data — the one place a global
    # window is legitimate
    key_struct = F.struct(*[F.col(c) for c, _ in key_order])
    stats = local.groupBy(_PID).agg(
        F.count(F.lit(1)).alias("_n_rows"),
        F.countDistinct(key_struct).alias("_n_keys"),
    )
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = stats.select(
        _PID,
        F.coalesce(F.sum("_n_rows").over(w_off), F.lit(0)).alias("_row_off"),
        F.coalesce(F.sum("_n_keys").over(w_off), F.lit(0)).alias("_key_off"),
        F.sum("_n_rows").over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n_total"),
    )

    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn("rn", (F.col("_row_off") + F.col("_rn_loc")).cast("bigint"))
        .withColumn("rnk", (F.col("_row_off") + F.col("_rnk_loc")).cast("bigint"))
        .withColumn("drnk", (F.col("_key_off") + F.col("_drnk_loc")).cast("bigint"))
        .withColumn("cum_cnt", (F.col("_row_off") + F.col("_cum_loc")).cast("bigint"))
        .drop(_PID, "_rn_loc", "_rnk_loc", "_drnk_loc", "_cum_loc", "_row_off", "_key_off")
    )


def _idiv(a: Column, b: Column) -> Column:
    """Exact floor division for non-negative longs: (a - a%b)/b — the
    numerator is exactly divisible, so the double division is exact
    (never float-rounds across an integer boundary, unlike a/b)."""
    return ((a - a % b) / b).cast("bigint")


def ntile_from_rn(rn: Column, n_total: Column, k: int) -> Column:
    """SQL NTILE(k) from an exact global row_number: the first
    ``N mod k`` buckets get ``N div k + 1`` rows, the rest ``N div k``
    — pure integer arithmetic, engine-exact."""
    kk = F.lit(k).cast("bigint")
    nq = _idiv(n_total, kk)  # base bucket size
    r = n_total % kk  # buckets that get one extra row
    big = r * (nq + 1)  # rows covered by the (nq+1)-sized buckets
    ceil_big = _idiv(rn + nq, nq + 1)  # ceil(rn / (nq+1))
    ceil_small = _idiv(rn - big + nq - 1, nq)  # ceil((rn-big) / nq)
    return F.when(rn <= big, ceil_big).otherwise(r + ceil_small).cast("bigint")


def with_global_cumsum(
    df: DataFrame,
    key_order: list[tuple[str, str]],
    tie_order: list[tuple[str, str]],
    sum_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global RUNNING TOTAL of ``sum_col`` in key+tie order —
    the cumulative-sum sibling of :func:`with_global_ranks`, built the
    same two-pass way so no unpartitioned window ever sees the data:
    range-partition on the key order, partition-local cumulative sum,
    then broadcast per-partition SUM offsets (bounded by the partition
    count, a cluster config constant). Pass an exact DECIMAL column —
    the local window sum, the offsets, and their addition then stay
    exact, so the running total is independent of partitioning.

    Adds ``rn`` (exact global row_number), ``cum_sum``, ``total_sum``
    and ``n_total``. Same localCheckpoint boundary-pinning as the
    ranking pass (the two consumers must see ONE set of sampled range
    boundaries). Same skew note as with_global_ranks."""

    def _sort(cols: list[tuple[str, str]]) -> list[Column]:
        return [
            F.desc(c) if d.lower().startswith("d") else F.asc(c) for c, d in cols
        ]

    key_sort = _sort(key_order)
    full_sort = key_sort + _sort(tie_order)
    n_part = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(n_part, *key_sort)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_cum = (
        Window.partitionBy(_PID)
        .orderBy(*full_sort)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rn = Window.partitionBy(_PID).orderBy(*full_sort)
    local = part.select(
        "*",
        F.row_number().over(w_rn).alias("_rn_loc"),
        F.sum(sum_col).over(w_cum).alias("_cum_loc"),
    )
    stats = local.groupBy(_PID).agg(
        F.count(F.lit(1)).alias("_n_rows"),
        F.sum(sum_col).alias("_p_sum"),
    )
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    offsets = stats.select(
        _PID,
        F.coalesce(F.sum("_n_rows").over(w_off), F.lit(0)).alias("_row_off"),
        F.coalesce(F.sum("_p_sum").over(w_off), F.lit(0)).alias("_sum_off"),
        F.sum("_n_rows").over(w_all).alias("n_total"),
        F.sum("_p_sum").over(w_all).alias("total_sum"),
    )
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn("rn", (F.col("_row_off") + F.col("_rn_loc")).cast("bigint"))
        .withColumn("cum_sum", F.col("_sum_off") + F.col("_cum_loc"))
        .drop(_PID, "_rn_loc", "_cum_loc", "_row_off", "_sum_off")
    )


def with_global_running_max(
    df: DataFrame,
    key_order: list[tuple[str, str]],
    val_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Adds ``run_max`` — the EXCLUSIVE global running maximum of
    ``val_col`` in key order (max over strictly-preceding rows; NULL
    on the first row) — the two-pass sibling of
    :func:`with_global_cumsum`, so no unpartitioned window sees the
    data: range-partition on the key order, partition-local exclusive
    window max, then broadcast per-partition maxima combined with a
    prefix-max over the bounded stats table. ``F.greatest`` skips
    NULLs, so the local exclusive max (NULL at each partition head)
    and the prior-partition offset merge without special cases.

    Rows-based exclusive frame: callers needing "strictly smaller
    KEY" semantics (e.g. the skyline operator) must pre-aggregate to
    one row per key so preceding-rows ≡ smaller-keys."""

    def _sort(cols: list[tuple[str, str]]) -> list[Column]:
        return [
            F.desc(c) if d.lower().startswith("d") else F.asc(c) for c, d in cols
        ]

    key_sort = _sort(key_order)
    n_part = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(n_part, *key_sort)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_loc = (
        Window.partitionBy(_PID)
        .orderBy(*key_sort)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = part.withColumn("_rm_loc", F.max(val_col).over(w_loc))
    stats = part.groupBy(_PID).agg(F.max(val_col).alias("_p_max"))
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = stats.select(_PID, F.max("_p_max").over(w_off).alias("_max_off"))
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn("run_max", F.greatest("_rm_loc", "_max_off"))
        .drop(_PID, "_rm_loc", "_max_off")
    )
