"""Local emulation of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry against its
``oracle_sql()`` twin on the same parquet tables and compares:
row count, column names, and order-insensitive values (rows sorted by all
columns after sorting columns by name — the driver's documented compare).

Usage:
    python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name, sdf, odf) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"]
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
        return problems
    a, b = normalize(sdf), normalize(odf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            import numpy as np

            if not np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-9, equal_nan=True):
                bad = (av.astype(float) - bv.astype(float)).abs().idxmax()
                problems.append(
                    f"float col {c} differs, e.g. row {bad}: {av[bad]!r} vs {bv[bad]!r}"
                )
        else:
            eq = av.astype(str).values == bv.astype(str).values
            if not eq.all():
                i = int((~eq).argmax())
                problems.append(f"col {c} differs at sorted row {i}: {av[i]!r} vs {bv[i]!r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from graph_partitioning_spark.session import get_spark

    spark = get_spark(app_name="check_contract", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"[FAIL] {name}: spark error: {str(ex).splitlines()[0][:160]}")
            failures += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows in {t1 - t0:.1f}s")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"[FAIL] {name}: oracle error: {str(ex).splitlines()[0][:160]}")
            failures += 1
            continue
        t2 = time.time()
        problems = compare(name, sdf, odf)
        if problems:
            failures += 1
            print(f"[FAIL] {name} ({len(sdf)} rows, spark {t1-t0:.1f}s, duck {t2-t1:.1f}s)")
            for p in problems:
                print(f"       {p}")
        else:
            print(f"[ OK ] {name}: {len(sdf)} rows (spark {t1-t0:.1f}s, duck {t2-t1:.1f}s)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
