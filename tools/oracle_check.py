"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, comparing row count, column names, and an
order-insensitive value multiset. Usage:

    python tools/oracle_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_val(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    if isinstance(v, (list, tuple)):
        # The DRIVER canonicalizes with pandas sort_values, which cannot
        # factorize list cells (r2: sim_quantize_int8 passed here while
        # failing the driver with "unhashable type: 'list'"). Mirror the
        # driver: array-typed output columns are a hard error — emit scalar
        # rows (posexplode / to_json) instead.
        raise TypeError(
            "array-typed result cell — driver-incompatible; scalarize the "
            "query output (posexplode or to_json)"
        )
    return v


def normalize(rows: list[dict], cols: list[str]):
    out = []
    for r in rows:
        out.append(tuple(norm_val(r[c]) for c in cols))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from polipus_spark.session import build_session

    spark = build_session(app_name="oracle_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sorted(sdf.columns)
        srows = [r.asDict() for r in sdf.collect()]
        if name not in oracles:
            print(f"  {name:28s} rows-only: {len(srows)} rows   [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.sql(oracles[name])
            dcols = sorted(ddf.columns)
            drows = [dict(zip(ddf.columns, row)) for row in ddf.fetchall()]
        except Exception as e:
            failures.append(name)
            print(f"  {name:28s} ORACLE SQL ERROR: {str(e).splitlines()[0][:140]}")
            continue
        ok_schema = scols == dcols
        ok_count = len(srows) == len(drows)
        ok_vals = False
        if ok_schema and ok_count:
            try:
                ok_vals = normalize(srows, scols) == normalize(drows, dcols)
            except TypeError as e:
                failures.append(name)
                print(f"  {name:28s} CANON ERROR (driver-incompatible): {e}")
                continue
        status = "OK" if (ok_schema and ok_count and ok_vals) else "MISMATCH"
        if status != "OK":
            failures.append(name)
        print(
            f"  {name:28s} {status}  spark={len(srows)} duck={len(drows)} "
            f"schema={'=' if ok_schema else f'{scols} vs {dcols}'} [{time.time()-t0:.1f}s]"
        )
        if status != "OK" and ok_schema and ok_count:
            a = normalize(srows, scols)
            b = normalize(drows, dcols)
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            for x, y in diffs:
                print(f"      spark: {x}\n      duck : {y}")
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
