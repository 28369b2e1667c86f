"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf against its
oracle_sql() in DuckDB; compares row count + column names + an
order-insensitive value hash (rows sorted by all columns, values normalized
to strings). Prints one line per query.

Usage: python tools/check_gate.py [sf_dir] [only_prefix]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(9).map(lambda x: "%.9f" % x if pd.notna(x) else "NULL")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.map(lambda x: str(bool(x)) if pd.notna(x) else "NULL")
        else:
            df[c] = s.map(lambda x: "NULL" if pd.isna(x) else str(x))
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else ""

    import __spark_entry__ as entrymod
    from citibike_pipeline_spark.session import get_spark

    spark = get_spark("gate", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and not name.startswith(only):
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(got)} rows (no oracle)  [{time.time()-t0:.1f}s]")
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL  {name}: rows {len(got)} != oracle {len(want)}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL  {name}: cols {sorted(got.columns)} != {sorted(want.columns)}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        if g.equals(w):
            print(f"PASS  {name}: {len(got)} rows  [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            diff = (g != w).any(axis=1)
            i = diff.idxmax()
            print(f"FAIL  {name}: value mismatch at sorted-row {i}")
            print("  got :", g.loc[i].to_dict())
            print("  want:", w.loc[i].to_dict())
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
