"""Local mirror of the driver's t2 correctness gate.

Runs every queries() entry at a given sf_dir on Spark AND its
oracle_sql() twin on DuckDB, then compares row count, column names, and
an order-insensitive value multiset. Exit code 1 on any mismatch.

Usage: python tools/check_oracle.py [sf_dir] [name_filter ...]
       (a name_filter starting with "!" EXCLUDES matching entries —
        e.g. `dedup_ '!dedup_edit_distance'` runs the dedup family
        minus the ASCII-only-oracle edit-distance twins)
"""

from __future__ import annotations

import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    return str(v)


def canon_duck_type(t: str) -> str:
    """Canonicalize a DuckDB type name for cross-engine comparison."""
    t = t.strip().upper()
    if t.endswith("[]"):
        return f"array<{canon_duck_type(t[:-2])}>"
    m = {
        "BIGINT": "int64", "INTEGER": "int32", "SMALLINT": "int16",
        "TINYINT": "int8", "HUGEINT": "int128", "UBIGINT": "uint64",
        "DOUBLE": "double", "FLOAT": "float", "VARCHAR": "string",
        "BOOLEAN": "bool", "DATE": "date", "BLOB": "binary",
    }
    if t in m:
        return m[t]
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.startswith("DECIMAL"):
        return t.lower().replace(" ", "")
    return t.lower()


def canon_spark_type(t: str) -> str:
    """Canonicalize a Spark simpleString dtype for comparison."""
    t = t.strip().lower()
    if t.startswith("array<") and t.endswith(">"):
        return f"array<{canon_spark_type(t[6:-1])}>"
    m = {
        "bigint": "int64", "int": "int32", "smallint": "int16",
        "tinyint": "int8", "double": "double", "float": "float",
        "string": "string", "boolean": "bool", "date": "date",
        "binary": "binary",
    }
    if t in m:
        return m[t]
    if t.startswith("timestamp"):  # timestamp | timestamp_ntz: both µs naive here
        return "timestamp"
    return t


def norm_rows(rows, col_order):
    out = []
    for r in rows:
        out.append(tuple(norm_value(r[i]) for i in col_order))
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]

    import __spark_entry__ as entrymod
    from bigquery_postgres_events_etl_spark.session import get_spark

    spark = get_spark()
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    include = [f for f in name_filter if not f.startswith("!")]
    exclude = [f[1:] for f in name_filter if f.startswith("!")]
    failures = []
    n_run = 0
    for name, fn in qs.items():
        if include and not any(f in name for f in include):
            continue
        if any(f in name for f in exclude):
            continue
        # the dedup verify tiers persist shingle/signature frames with
        # no later unpersist handle; a full 250-entry run in one JVM
        # would accumulate them — drop caches periodically so the tool
        # measures queries, not heap pressure
        n_run += 1
        if n_run % 25 == 0:
            spark.catalog.clearCache()
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only check, {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            if len(srows) == 0:
                print(f"WARN {name}: 0 rows")
            continue
        try:
            # DESCRIBE binds without executing — gives real DuckDB types
            # (the DBAPI description only exposes generic codes).
            otypes_raw = dict(
                con.execute(
                    f"SELECT column_name, column_type FROM "
                    f"(DESCRIBE ({oracles[name]}))"
                ).fetchall()
            )
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue

        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            ok = False
        else:
            # Type-aware check: the driver's value hash is type-sensitive
            # (r1 'sessionization' failed there on HUGEINT-vs-BIGINT while
            # the str() multiset below matched) — compare canonical types
            # per column so the local gate is at least as strict.
            stypes = {c: canon_spark_type(t) for c, t in sdf.dtypes}
            otypes = {
                c: canon_duck_type(str(t)) for c, t in otypes_raw.items()
            }
            for c in scols:
                if stypes[c] != otypes.get(c):
                    print(f"FAIL {name}: type mismatch on '{c}': "
                          f"spark={stypes[c]} oracle={otypes.get(c)}")
                    ok = False
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            ok = False
        if ok:
            s_order = [scols.index(c) for c in sorted(scols)]
            o_order = [ocols.index(c) for c in sorted(ocols)]
            ns = norm_rows([tuple(r) for r in srows], s_order)
            no = norm_rows(orows, o_order)
            if ns != no:
                ok = False
                ndiff = sum(1 for a, b in zip(ns, no) if a != b)
                print(f"FAIL {name}: value mismatch ({ndiff}/{len(ns)} rows differ)")
                for a, b in zip(ns, no):
                    if a != b:
                        print(f"  spark : {a}\n  oracle: {b}")
                        break
        if ok:
            print(f"OK   {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
