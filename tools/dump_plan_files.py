"""Dump per-query ``explain("formatted")`` files for the optimization
round's before/after evidence.

Usage:
    python tools/dump_plan_files.py <tree_root> <out_dir> <suffix> <query> [...]

Writes ``<out_dir>/<query>_<suffix>.txt`` for each query, importing the
registry from ``<tree_root>`` (so a git worktree of an older commit
yields that commit's plans).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys


def main() -> None:
    tree, out_dir, suffix, *names = sys.argv[1:]
    tree = os.path.abspath(tree)
    os.makedirs(out_dir, exist_ok=True)
    sys.path.insert(0, tree)

    from bigquery_postgres_events_etl_spark.registry import all_queries
    from bigquery_postgres_events_etl_spark.session import get_spark

    spark = get_spark(app_name=f"plans-{suffix}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = all_queries()
    for name in names:
        spark.catalog.clearCache()
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(
                f"# {name} — explain('formatted') at {os.path.basename(sf_dir)}"
                f" on tree {tree}\n\n"
            )
            f.write(buf.getvalue())
        print("wrote", path)


if __name__ == "__main__":
    main()
