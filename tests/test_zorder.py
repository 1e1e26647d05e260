"""Z-order clustering: prove the file-skipping claim from parquet
footer statistics, not from plan shape — a z-ordered layout must be
prunable on BOTH dimensions, a single-column sort only on its own."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from bigquery_postgres_events_etl_spark.io import load_table
from bigquery_postgres_events_etl_spark.operators.zorder import write_zordered


def _envelopes(path: str, col: str) -> list[tuple[int, int]]:
    """Per-file (min, max) of ``col`` across all row groups — the
    stats a skipping reader consults before opening the file."""
    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((lo, hi))
    return out


def _avg_containment(envs: list[tuple[int, int]], values: list[int]) -> float:
    """Average number of files a point predicate on ``values`` cannot
    skip (its value inside the file's [min, max] envelope)."""
    return sum(
        sum(1 for lo, hi in envs if lo <= v <= hi) for v in values
    ) / len(values)


def test_zorder_layout_prunes_both_dimensions(spark, sf_dir, tmp_path):
    # 16 files: enough z-curve segments that each file's bounding box
    # covers ~a quarter of each dimension (at 8 the segments still
    # span half the user domain and the win is only ~40%)
    n_files = 16
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.expr("unix_micros(ts) div 60000000").alias("ts_min"),
        )
    )
    zpath, tpath = str(tmp_path / "zorder"), str(tmp_path / "tsorted")
    write_zordered(e, zpath, "user_id", "ts_min", n_files=n_files)
    # baseline: the conventional single-column clustering
    (
        e.repartitionByRange(n_files, "ts_min")
        .sortWithinPartitions("ts_min")
        .write.mode("overwrite")
        .parquet(tpath)
    )
    assert len(_envelopes(zpath, "user_id")) == n_files

    rows = e.select("user_id", "ts_min").collect()
    users = sorted({r.user_id for r in rows})
    minutes = sorted({r.ts_min for r in rows})
    probe_users = users[:: max(1, len(users) // 20)]
    probe_minutes = minutes[:: max(1, len(minutes) // 20)]

    z_user = _avg_containment(_envelopes(zpath, "user_id"), probe_users)
    z_ts = _avg_containment(_envelopes(zpath, "ts_min"), probe_minutes)
    t_user = _avg_containment(_envelopes(tpath, "user_id"), probe_users)
    t_ts = _avg_containment(_envelopes(tpath, "ts_min"), probe_minutes)

    # single sort: its own column prunes hard, the other not at all
    assert t_ts <= 2.0
    assert t_user == n_files
    # z-order: BOTH dimensions prune — no dimension degenerates to
    # read-everything, and the second dimension beats the single-sort
    # layout by a wide margin
    assert z_user <= 0.75 * n_files
    assert z_ts <= 0.75 * n_files
    assert z_user <= 0.5 * t_user

    # layout changed, content didn't: the rewrite is a permutation
    z_back = spark.read.parquet(zpath)
    assert z_back.count() == e.count()
    assert z_back.select(F.sum("event_id")).first()[0] == e.select(
        F.sum("event_id")
    ).first()[0]


def test_morton_interleave_matches_reference(spark):
    """The shift-or-mask spread ladder must equal a bit-by-bit Python
    interleave for arbitrary 16-bit inputs (and hence be a bijection
    on the probed grid)."""
    from pyspark.sql import functions as F

    from bigquery_postgres_events_etl_spark.operators.zorder import morton_z

    def ref(x, y):
        z = 0
        for b in range(16):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    xs = [0, 1, 2, 3, 255, 256, 4095, 21845, 43690, 65535]
    pairs = [(x, y) for x in xs for y in xs]
    df = spark.createDataFrame(pairs, "x BIGINT, y BIGINT")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", F.expr(morton_z("x", "y")).alias("z")).collect()
    }
    want = {(x, y): ref(x, y) for x, y in pairs}
    assert got == want
    assert len(set(got.values())) == len(pairs)  # injective on the grid
