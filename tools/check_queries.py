"""Local replica of the driver's correctness gate: run every QUERIES
entry and its ORACLES twin side-by-side, compare row count, column
names/dtypes, and an order-insensitive value hash. Usage:

    python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_frame(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    out = []
    for col in df.columns:
        s = df[col]
        if s.dtype == "float64" or s.dtype == "float32":
            df[col] = s.astype("float64").round(6)
    for row in df.itertuples(index=False):
        out.append(tuple("<NULL>" if pd.isna(v) else str(v) for v in row))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # accept space- and comma-separated names; tolerate a literal --only
    raw = [n for a in sys.argv[2:] for n in a.split(",") if n and n != "--only"]
    only = set(raw)

    from rdf2smw_spark.queries import ORACLES, QUERIES

    # an unknown name must FAIL, not silently filter to zero queries —
    # a vacuous '0 failures' once masked a real oracle mismatch
    unknown = only - set(QUERIES)
    if unknown:
        print(f"FAIL  unknown query names: {sorted(unknown)}")
        return 1
    from rdf2smw_spark.session import get_spark

    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    from rdf2smw_spark.session import release_scoped_caches

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        finally:
            # each query's scoped persists (minhash bands, shingles,
            # conversion dims) are dead after its toPandas — release per
            # iteration or the 47-query sweep accumulates them all
            # (memory pressure/spill at larger sf dirs; ADVICE r3)
            release_scoped_caches()
        if name not in ORACLES:
            print(f"ok    {name}: rows-only ({len(sdf)} rows, {time.monotonic()-t0:.1f}s)")
            if len(sdf) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            ddf = con.sql(ORACLES[name]).df()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {exc}")
            continue
        scols = sorted(sdf.columns)
        dcols = sorted(ddf.columns)
        if scols != dcols:
            failures.append(name)
            print(f"FAIL  {name}: columns {scols} vs {dcols}")
            continue
        if len(sdf) != len(ddf):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(sdf)} vs {len(ddf)}")
            continue
        a, b = norm_frame(sdf), norm_frame(ddf)
        if a != b:
            failures.append(name)
            sa, sb = set(a), set(b)
            print(f"FAIL  {name}: value mismatch; only-spark={list(sa-sb)[:2]} only-duck={list(sb-sa)[:2]}")
            continue
        print(f"ok    {name}: {len(sdf)} rows match ({time.monotonic()-t0:.1f}s)")

    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
