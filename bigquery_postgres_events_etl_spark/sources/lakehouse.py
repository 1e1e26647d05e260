"""Minimal versioned-table layer over parquet: MERGE semantics and
time travel, the two lakehouse capabilities plain `mode("append")`
cannot give you (what Delta/Iceberg provide; rebuilt here from
primitives so the engine is complete without either dependency).

Layout:
    table_dir/
      v=1/  v=2/ ...        immutable version snapshots (parquet)
      _manifest.json         {"current": N, "versions": {...}}

The manifest is the single source of truth and is published by
write-to-tmp + atomic os.replace — readers either see the old version
or the new one, never a half-state. Writers serialize on the existing
``TargetLock`` (same lock the append/compaction paths take, so MERGE
composes with them). Old versions stay readable until vacuumed —
that's time travel.

MERGE = read current snapshot, full-outer against the updates on the
key, matched rows take the update's values, unmatched-source rows
insert, unmatched-target rows carry over — one distributed join, then
a NEW immutable snapshot. No file is ever rewritten in place.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sinks import TargetLock

_MANIFEST = "_manifest.json"


def _manifest_path(table_dir: str) -> str:
    return os.path.join(table_dir, _MANIFEST)


def _read_manifest(table_dir: str) -> dict:
    p = _manifest_path(table_dir)
    if not os.path.exists(p):
        return {"current": 0, "versions": {}}
    with open(p) as f:
        return json.load(f)


def _publish_manifest(table_dir: str, manifest: dict) -> None:
    tmp = _manifest_path(table_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(table_dir))  # atomic on POSIX


def current_version(table_dir: str) -> int:
    return _read_manifest(table_dir)["current"]


def _next_version(m: dict) -> int:
    """Next version NUMBER: one past the highest ever published, not
    current+1 — after a restore_table rollback the abandoned newer
    versions still exist on disk, and current+1 would silently
    overwrite one."""
    highest = max((int(v) for v in m["versions"]), default=0)
    return max(highest, m["current"]) + 1


def read_table(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the current snapshot, or any retained version (time
    travel)."""
    m = _read_manifest(table_dir)
    v = m["current"] if version is None else version
    if v == 0 or str(v) not in m["versions"]:
        raise ValueError(f"version {v} does not exist in {table_dir}")
    return spark.read.parquet(os.path.join(table_dir, f"v={v}"))


def write_snapshot(df: DataFrame, table_dir: str, note: str = "") -> int:
    """Publish ``df`` as the next immutable version. Returns it."""
    os.makedirs(table_dir, exist_ok=True)
    with TargetLock(table_dir):
        m = _read_manifest(table_dir)
        v = _next_version(m)
        path = os.path.join(table_dir, f"v={v}")
        df.write.mode("overwrite").parquet(path)
        m["versions"][str(v)] = {"note": note}
        m["current"] = v
        _publish_manifest(table_dir, m)
        return v


def merge_upsert(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    key_cols: list[str],
) -> dict:
    """MERGE INTO: rows matching on ``key_cols`` take the update's
    values, new keys insert, untouched rows carry over — published as
    a new snapshot (the previous version remains readable). The join
    shuffles both sides on the key once; at 100 TB pair this with the
    daily-partition layout so only affected partitions join."""
    with TargetLock(table_dir):
        m = _read_manifest(table_dir)
        base = (
            spark.read.parquet(os.path.join(table_dir, f"v={m['current']}"))
            if m["current"]
            else spark.createDataFrame([], updates.schema)
        )
        val_cols = [c for c in updates.columns if c not in key_cols]
        b = base.alias("b")
        # presence marker: "this side had a row" must not be inferred
        # from key nullability (a null-keyed update row would misroute)
        u = updates.withColumn("__is_update", F.lit(1)).alias("u")
        cond = [F.col(f"b.{k}").eqNullSafe(F.col(f"u.{k}")) for k in key_cols]
        merged = b.join(u, cond, "full_outer").select(
            *[
                F.when(F.col("u.__is_update").isNotNull(), F.col(f"u.{k}"))
                .otherwise(F.col(f"b.{k}"))
                .alias(k)
                for k in key_cols
            ],
            *[
                F.when(F.col("u.__is_update").isNotNull(), F.col(f"u.{c}"))
                .otherwise(F.col(f"b.{c}"))
                .alias(c)
                for c in val_cols
            ],
        )
        v = _next_version(m)
        path = os.path.join(table_dir, f"v={v}")
        merged.write.mode("overwrite").parquet(path)
        n_rows = spark.read.parquet(path).count()
        m["versions"][str(v)] = {"note": f"merge on {key_cols}"}
        m["current"] = v
        _publish_manifest(table_dir, m)
        return {"version": v, "rows": n_rows}


def vacuum(table_dir: str, keep_last: int = 2) -> list[int]:
    """Drop snapshot dirs older than the last ``keep_last`` versions
    (bounded storage; time travel keeps only the retained window)."""
    import shutil

    with TargetLock(table_dir):
        m = _read_manifest(table_dir)
        versions = sorted(int(v) for v in m["versions"])
        to_drop = versions[:-keep_last] if keep_last else versions
        for v in to_drop:
            shutil.rmtree(os.path.join(table_dir, f"v={v}"), ignore_errors=True)
            del m["versions"][str(v)]
        _publish_manifest(table_dir, m)
        return to_drop


def apply_changelog(
    spark: SparkSession,
    table_dir: str,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
    epoch: int | None = None,
) -> dict:
    """Apply a CDC changelog (op ∈ {'I','U','D'}) to the versioned
    table — the consumer side of `etl_snapshot_diff`'s producer:
    inserts and updates upsert, deletes drop the key, untouched rows
    carry over; published as a new immutable snapshot. If a key
    appears multiple times in the batch, the LAST op wins by a
    deterministic (key, op-order) rule the caller controls via a
    `seq` column; absent one, duplicate keys are rejected loudly
    (silent arbitrary-winner is the classic CDC corruption).

    ``epoch`` (streaming use — see ``run_streaming_cdc_to_lake``)
    makes the apply EXACTLY-ONCE per micro-batch: an epoch already in
    the manifest's ``applied_epochs`` ledger is a no-op, and the
    ledger entry is written in the SAME atomic manifest publish as
    the version pointer — a crash after the snapshot write but before
    the publish leaves the ledger un-advanced, so the replay simply
    overwrites the unpublished version dir and publishes once."""
    if epoch is not None:
        m0 = _read_manifest(table_dir)
        if str(epoch) in m0.get("applied_epochs", []):
            return {"version": m0["current"], "rows": None, "skipped_epoch": epoch}
    dup = (
        changes.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            "changelog has duplicate keys; pre-collapse with a seq column"
        )
    with TargetLock(table_dir):
        m = _read_manifest(table_dir)
        if epoch is not None and str(epoch) in m.get("applied_epochs", []):
            # another worker applied this epoch between the fast-path
            # check and lock entry
            return {"version": m["current"], "rows": None, "skipped_epoch": epoch}
        base = (
            spark.read.parquet(os.path.join(table_dir, f"v={m['current']}"))
            if m["current"]
            else spark.createDataFrame([], changes.drop(op_col).schema)
        )
        val_cols = [
            c for c in changes.columns if c not in key_cols and c != op_col
        ]
        b = base.alias("b")
        u = changes.withColumn("__present", F.lit(1)).alias("u")
        cond = [F.col(f"b.{k}").eqNullSafe(F.col(f"u.{k}")) for k in key_cols]
        joined = b.join(u, cond, "full_outer")
        survived = joined.where(
            F.col("u.__present").isNull() | (F.col(f"u.{op_col}") != "D")
        )
        merged = survived.select(
            *[
                F.when(F.col("u.__present").isNotNull(), F.col(f"u.{k}"))
                .otherwise(F.col(f"b.{k}"))
                .alias(k)
                for k in key_cols
            ],
            *[
                F.when(F.col("u.__present").isNotNull(), F.col(f"u.{c}"))
                .otherwise(F.col(f"b.{c}"))
                .alias(c)
                for c in val_cols
            ],
        )
        v = _next_version(m)
        path = os.path.join(table_dir, f"v={v}")
        merged.write.mode("overwrite").parquet(path)
        n = spark.read.parquet(path).count()
        m["versions"][str(v)] = {"note": f"changelog on {key_cols}"}
        m["current"] = v
        if epoch is not None:
            m.setdefault("applied_epochs", []).append(str(epoch))
        _publish_manifest(table_dir, m)
        return {"version": v, "rows": n}


def checked_write(
    df: DataFrame,
    table_dir: str,
    expectations: list[tuple[str, str]],
    note: str = "",
) -> int:
    """DQ-GATED publish: evaluate every (rule_name, violation_predicate)
    as one conditional-aggregate pass over ``df``; if ANY rule has
    violations the snapshot is NOT published and the error names each
    failing rule with its count — the promotion gate
    `dq_expectations_report` describes, actually wired to the write
    path. One extra aggregation job; the table's current version is
    untouched on failure."""
    agg = df.agg(
        *[
            F.count_if(F.expr(pred)).alias(name)
            for name, pred in expectations
        ]
    ).first()
    failed = {name: agg[name] for name, _ in expectations if agg[name] > 0}
    if failed:
        raise ValueError(f"expectations failed, snapshot not published: {failed}")
    return write_snapshot(df, table_dir, note=note)


def scd2_apply(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    effective_us: int,
) -> dict:
    """SCD Type-2 MAINTENANCE on the versioned dimension (the write-
    side twin of the `etl_scd2_user_state` derivation): for each
    incoming key whose ``compare_cols`` differ from the key's CURRENT
    row, the current row closes (``valid_to_us = effective_us``) and a
    new current row opens at ``effective_us``; brand-new keys open a
    first interval; unchanged keys and all history rows carry over
    untouched. One keyed join against the current slice only (history
    never joins), then a new immutable snapshot.

    First call bootstraps the dimension: every update row opens with
    ``valid_from_us = effective_us`` and an open ``valid_to_us``.
    """
    meta = ["valid_from_us", "valid_to_us", "is_current"]
    with TargetLock(table_dir):
        m = _read_manifest(table_dir)
        if m["current"]:
            base = spark.read.parquet(
                os.path.join(table_dir, f"v={m['current']}")
            )
        else:
            base = None

        opened = updates.select(
            *key_cols,
            *compare_cols,
            F.lit(effective_us).cast("bigint").alias("valid_from_us"),
            F.lit(None).cast("bigint").alias("valid_to_us"),
            F.lit(1).alias("is_current"),
        )
        if base is None:
            merged = opened
            n_changed = opened.count()
        else:
            history = base.where(F.col("is_current") == 0)
            cur = base.where(F.col("is_current") == 1).alias("b")
            u = updates.withColumn("__present", F.lit(1)).alias("u")
            cond = [
                F.col(f"b.{k}").eqNullSafe(F.col(f"u.{k}")) for k in key_cols
            ]
            j = cur.join(u, cond, "full_outer")
            changed = F.col("u.__present").isNotNull() & (
                F.col("b.is_current").isNull()  # brand-new key
                | ~F.struct(*[F.col(f"b.{c}") for c in compare_cols]).eqNullSafe(
                    F.struct(*[F.col(f"u.{c}") for c in compare_cols])
                )
            )
            # current rows: carried over unchanged, or closed if changed
            kept_cur = j.where(F.col("b.is_current").isNotNull()).select(
                *[F.col(f"b.{k}").alias(k) for k in key_cols],
                *[F.col(f"b.{c}").alias(c) for c in compare_cols],
                F.col("b.valid_from_us").alias("valid_from_us"),
                F.when(changed, F.lit(effective_us).cast("bigint"))
                .otherwise(F.col("b.valid_to_us"))
                .alias("valid_to_us"),
                F.when(changed, F.lit(0)).otherwise(F.lit(1)).alias("is_current"),
            )
            new_cur = (
                j.where(changed)
                .select(
                    *[F.col(f"u.{k}").alias(k) for k in key_cols],
                    *[F.col(f"u.{c}").alias(c) for c in compare_cols],
                    F.lit(effective_us).cast("bigint").alias("valid_from_us"),
                    F.lit(None).cast("bigint").alias("valid_to_us"),
                    F.lit(1).alias("is_current"),
                )
            )
            merged = history.select(*key_cols, *compare_cols, *meta).unionByName(
                kept_cur
            ).unionByName(new_cur)
            n_changed = new_cur.count()

        v = _next_version(m)
        path = os.path.join(table_dir, f"v={v}")
        merged.write.mode("overwrite").parquet(path)
        m["versions"][str(v)] = {"note": f"scd2 @ {effective_us}"}
        m["current"] = v
        _publish_manifest(table_dir, m)
        return {"version": v, "changed_keys": n_changed}


def purge_keys(
    spark: SparkSession,
    table_dir: str,
    key_col: str,
    keys: list,
) -> dict:
    """Right-to-erasure (GDPR Art. 17) purge: publish a new version
    with every row matching ``keys`` removed, rewriting ONLY the
    files whose parquet footer min/max statistics can contain a
    target key — clean files are carried into the new version
    byte-identical (hard link when possible), so erasure cost scales
    with the files the subject actually touches, not with the table.
    A file with missing stats is treated as affected (conservative).

    History is then SCRUBBED: every earlier version is dropped from
    the manifest and disk, because a purge that time travel can undo
    is not an erasure. The returned stats make the operation
    auditable (what was rewritten, what was untouched, how many rows
    left). Serializes on the same TargetLock as every other writer.

    At cluster scale the same footer-pruning decision is what a
    key-sorted / z-ordered layout buys: purge requests cluster into
    few files instead of touching all of them (see
    operators/zorder.py).
    """
    import shutil

    import pyarrow.parquet as pq

    key_set = set(keys)
    with TargetLock(table_dir):
        m = _read_manifest(table_dir)
        if not m["current"]:
            raise ValueError(f"no current version in {table_dir}")
        cur_dir = os.path.join(table_dir, f"v={m['current']}")
        data_files = sorted(
            f for f in os.listdir(cur_dir)
            if f.endswith(".parquet") and not f.startswith("_")
        )
        affected, clean = [], []
        for fname in data_files:
            fpath = os.path.join(cur_dir, fname)
            meta = pq.ParquetFile(fpath).metadata
            try:
                idx = meta.schema.names.index(key_col)
            except ValueError as exc:
                raise ValueError(f"{key_col} not in {fpath}") from exc
            may_hit = False
            for rg in range(meta.num_row_groups):
                stats = meta.row_group(rg).column(idx).statistics
                if stats is None or not stats.has_min_max:
                    may_hit = True
                    break
                if any(stats.min <= k <= stats.max for k in key_set):
                    may_hit = True
                    break
            (affected if may_hit else clean).append(fname)

        v = _next_version(m)
        new_dir = os.path.join(table_dir, f"v={v}")
        tmp_dir = new_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir)
        rows_removed = 0
        if affected:
            paths = [os.path.join(cur_dir, f) for f in affected]
            src = spark.read.parquet(*paths)
            rows_removed = src.where(F.col(key_col).isin(list(key_set))).count()
            rewrite_dir = os.path.join(tmp_dir, "_rewrite")
            (
                src.where(~F.col(key_col).isin(list(key_set)))
                .write.mode("overwrite")
                .parquet(rewrite_dir)
            )
            for i, part in enumerate(
                sorted(p for p in os.listdir(rewrite_dir) if p.endswith(".parquet"))
            ):
                os.replace(
                    os.path.join(rewrite_dir, part),
                    os.path.join(tmp_dir, f"purged-{i:05d}.parquet"),
                )
            shutil.rmtree(rewrite_dir)
        for fname in clean:
            src_path = os.path.join(cur_dir, fname)
            dst_path = os.path.join(tmp_dir, fname)
            try:
                os.link(src_path, dst_path)
            except OSError:
                shutil.copy2(src_path, dst_path)
        os.replace(tmp_dir, new_dir)

        scrubbed = sorted(int(x) for x in m["versions"])
        for old_v in scrubbed:
            shutil.rmtree(os.path.join(table_dir, f"v={old_v}"), ignore_errors=True)
        m["versions"] = {
            str(v): {"note": f"purge {len(key_set)} keys on {key_col}"}
        }
        m["current"] = v
        _publish_manifest(table_dir, m)
        return {
            "version": v,
            "files_rewritten": len(affected),
            "files_retained": len(clean),
            "rows_removed": rows_removed,
            "versions_scrubbed": scrubbed,
        }


def merge_additive(
    spark: SparkSession,
    table_dir: str,
    delta: DataFrame,
    key_cols: list[str],
    add_cols: list[str],
    epoch: int | None = None,
) -> dict:
    """ADDITIVE merge — the metrics-table counterpart of
    :func:`merge_upsert`: matched keys ADD the delta's mergeable
    partial states (counts, exact decimal sums) instead of replacing
    the row; unmatched delta keys insert; untouched rows carry over.
    This is the write side of the incremental-materialized-view
    algebra the `events_mergeable_daily_rollup` /
    `ivm_join_delta_orders` entries prove read-side: a nightly
    refresh folds ONE day's partials into stored state — O(|Δ| +
    |state|) per refresh, never O(history).

    Only works for genuinely mergeable columns (counts add, decimal
    sums add, min/max would need their own combinators — rejected
    here rather than silently mis-merged: pass them through
    ``key_cols`` or precompute). ``epoch`` gives exactly-once per
    micro-batch via the same manifest ledger as
    :func:`apply_changelog`."""
    bad = [c for c in delta.columns if c not in key_cols and c not in add_cols]
    if bad:
        raise ValueError(
            f"non-key, non-additive columns {bad}: additive merge would "
            f"silently pick one side — drop them or declare them additive"
        )
    if epoch is not None:
        m0 = _read_manifest(table_dir)
        if str(epoch) in m0.get("applied_epochs", []):
            return {"version": m0["current"], "rows": None, "skipped_epoch": epoch}
    with TargetLock(table_dir):
        m = _read_manifest(table_dir)
        if epoch is not None and str(epoch) in m.get("applied_epochs", []):
            return {"version": m["current"], "rows": None, "skipped_epoch": epoch}
        base = (
            spark.read.parquet(os.path.join(table_dir, f"v={m['current']}"))
            if m["current"]
            else spark.createDataFrame([], delta.schema)
        )
        b = base.alias("b")
        u = delta.withColumn("__present", F.lit(1)).alias("u")
        cond = [F.col(f"b.{k}").eqNullSafe(F.col(f"u.{k}")) for k in key_cols]
        merged = b.join(u, cond, "full_outer").select(
            *[
                F.coalesce(F.col(f"u.{k}"), F.col(f"b.{k}")).alias(k)
                for k in key_cols
            ],
            *[
                (
                    F.coalesce(F.col(f"b.{c}"), F.lit(0))
                    + F.coalesce(F.col(f"u.{c}"), F.lit(0))
                ).alias(c)
                for c in add_cols
            ],
        )
        v = _next_version(m)
        path = os.path.join(table_dir, f"v={v}")
        merged.write.mode("overwrite").parquet(path)
        n = spark.read.parquet(path).count()
        m["versions"][str(v)] = {"note": f"additive merge on {key_cols}"}
        m["current"] = v
        if epoch is not None:
            m.setdefault("applied_epochs", []).append(str(epoch))
        _publish_manifest(table_dir, m)
        return {"version": v, "rows": n}


def clone_table(source_dir: str, target_dir: str) -> dict:
    """Zero-copy CLONE of the current version (the Delta 'shallow
    clone' shape, rebuilt on hard links): the clone's v=1 references
    the source's current data files byte-identically without copying
    them (falls back to a real copy across filesystems), under its
    own fresh manifest — so experiments branch from production state
    in O(files) time and O(0) extra storage, and diverge
    independently from the first write (immutable snapshots are never
    modified in place, so a shared file can never be changed by
    either side; purge_keys replaces rather than rewrites, which is
    what makes hard-link sharing safe).

    The clone starts with an empty epoch ledger — it is a NEW table
    whose future CDC stream is its own."""
    import shutil

    with TargetLock(source_dir):
        m = _read_manifest(source_dir)
        if not m["current"]:
            raise ValueError(f"no current version in {source_dir}")
        src = os.path.join(source_dir, f"v={m['current']}")
        os.makedirs(target_dir, exist_ok=True)
        dst = os.path.join(target_dir, "v=1")
        tmp = dst + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        n_files = 0
        for fname in sorted(os.listdir(src)):
            if not fname.endswith(".parquet"):
                continue
            try:
                os.link(os.path.join(src, fname), os.path.join(tmp, fname))
            except OSError:
                shutil.copy2(os.path.join(src, fname), os.path.join(tmp, fname))
            n_files += 1
        os.replace(tmp, dst)
        _publish_manifest(
            target_dir,
            {
                "current": 1,
                "versions": {
                    "1": {"note": f"clone of {source_dir} v={m['current']}"}
                },
            },
        )
        return {"version": 1, "files": n_files, "source_version": m["current"]}


def restore_table(table_dir: str, version: int) -> dict:
    """RESTORE (Delta's rollback verb): repoint ``current`` at a
    retained earlier version — no data movement, one atomic manifest
    publish. The abandoned newer versions stay on disk and readable
    (time travel forward still works) until vacuumed; a later write
    continues the version sequence from the HIGHEST version ever
    published, so restore never re-uses a version number."""
    with TargetLock(table_dir):
        m = _read_manifest(table_dir)
        if str(version) not in m["versions"]:
            raise ValueError(
                f"version {version} not retained in {table_dir} "
                f"(have: {sorted(map(int, m['versions']))})"
            )
        prev = m["current"]
        m["current"] = version
        m["versions"][str(version)]["note"] = (
            m["versions"][str(version)].get("note", "")
            + f" [restored over v={prev}]"
        )
        _publish_manifest(table_dir, m)
        return {"restored_to": version, "was": prev}
