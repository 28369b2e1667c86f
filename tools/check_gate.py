"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf against its
oracle_sql() in DuckDB; compares row count + column names + an
order-insensitive value hash (rows sorted by all columns, values normalized
to strings). Prints one line per query.

Usage: python tools/check_gate.py [sf_dir] [only_prefix] [--adaptive] [--json out.json]

--adaptive  render the corpus-adaptive oracle generators (registry
            ADAPTIVE_SQL) at the MEASURED corpus size instead of using the
            static gate-corpus-anchored strings — this is what hash-verifies
            the auto-sized d05/d06/d08/e02/e03 plans at sf0.1, where
            sizing.py picks (8,3) bands / 12 bits / 12 planes (r4 verdict
            #1). At the anchor corpus the rendered SQL is byte-identical to
            the static strings, so --adaptive is always safe.
--json F    also write the per-query results as JSON (the committed
            GATE_LOCAL_r{N}.json attestation, r4 verdict #3).
"""

from __future__ import annotations

import json
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
    argv = list(sys.argv[1:])
    adaptive = "--adaptive" in argv
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            sys.exit("--json requires an output filename")
        json_out = argv[i + 1]
        del argv[i: i + 2]
    argv = [a for a in argv if a != "--adaptive"]
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    only = argv[1] if len(argv) > 1 else ""

    import __spark_entry__ as entrymod
    from citibike_pipeline_spark.session import get_spark

    spark = get_spark("gate", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    adaptive_meta: dict[str, dict] = {}
    if adaptive:
        from citibike_pipeline_spark.operators.registry import ADAPTIVE_SQL

        counts = {
            "n_docs": con.execute("SELECT COUNT(*) FROM documents").fetchone()[0],
            "n_vecs": con.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0],
            "n_labels": con.execute(
                "SELECT COUNT(DISTINCT label) FROM embeddings"
            ).fetchone()[0],
        }
        print(f"-- adaptive oracles at corpus {counts}")
        for name, gen in ADAPTIVE_SQL.items():
            rendered = gen(counts)
            if rendered is None:
                # the oracle cannot express this width (e.g. d06 >32 bits —
                # the xxhash64 source has no DuckDB analog): drop to the
                # rows-only path instead of failing the whole run
                adaptive_meta[name] = {"adaptive": True, "off_anchor": True}
                oracles.pop(name, None)
                continue
            adaptive_meta[name] = {
                "adaptive": True,
                "off_anchor": rendered != oracles.get(name),
            }
            oracles[name] = rendered

    results: dict[str, dict] = {}
    n_pass = n_fail = 0

    def record(name, **kw):
        row = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        row.update(adaptive_meta.get(name, {}))
        row.update(kw)
        results[name] = row

    for name, fn in qs.items():
        prefixes = tuple(p for p in only.split(",") if p)  # "" matches all
        if prefixes and not name.startswith(prefixes):
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            err = str(e).splitlines()[0][:160]
            print(f"FAIL  {name}: spark error: {err}")
            record(name, err=f"spark: {err}")
            n_fail += 1
            continue
        if name not in oracles:
            # rows-only entries must NOT reuse rows_match (which elsewhere
            # means spark==oracle): record the weaker check under its own
            # name so the attestation never reads as oracle-verified
            print(f"ROWS  {name}: {len(got)} rows (no oracle)  [{time.time()-t0:.1f}s]")
            record(name, spark_rows=len(got), mode="rows_only",
                   nonempty=len(got) > 0)
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            err = str(e).splitlines()[0][:160]
            print(f"FAIL  {name}: duckdb error: {err}")
            record(name, err=f"duckdb: {err}")
            n_fail += 1
            continue
        record(name, spark_rows=len(got), oracle_rows=len(want),
               rows_match=len(got) == len(want),
               schema_match=sorted(got.columns) == sorted(want.columns))
        if len(got) != len(want):
            print(f"FAIL  {name}: rows {len(got)} != oracle {len(want)}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL  {name}: cols {sorted(got.columns)} != {sorted(want.columns)}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        results[name]["hash_match"] = bool(g.equals(w))
        if results[name]["hash_match"]:
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
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "adaptive": adaptive,
                       "results": results}, f, indent=1)
        print(f"wrote {json_out}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
