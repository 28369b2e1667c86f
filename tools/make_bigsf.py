"""Deterministic local up-scaler for performance measurement ONLY.

The driver measures the round at a driver-generated scale factor (sf1.0 in
BENCH_r05: lineitem 6M rows). That data is not on disk, so for local
before/after timing we synthesize an sf1.0-shaped dataset from the committed
sf0.1 tables: N disjoint replicas with shifted key spaces.

Faithfulness notes (what matters for the hot operators):
  - documents: every word token of replica i>0 is prefixed with "r{i}" so
    word- and char-shingles differ across replicas -> no cross-replica
    near-duplicate pairs; each replica keeps the original planted dup
    cohorts, so the corpus-wide duplicate RATE matches sf0.1 (what the
    driver's generator also does at higher sf).
  - embeddings: replicas get ~5 percent deterministic per-component noise so
    cosine(replica, original) < 0.999 -- below every near-dup threshold in
    e03 -- while cluster structure (labels) is preserved.
  - facts/dims: key spaces shifted per replica, FK-consistent; region and
    nation stay fixed (TPC-H semantics).

This file is NOT part of bench.py and writes only under /tmp.

Usage: python tools/make_bigsf.py [N_REPLICAS] [OUT_DIR]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

OFFSETS = {
    "c_custkey": 15_000,
    "s_suppkey": 1_000,
    "p_partkey": 20_000,
    "o_orderkey": 150_000,
    "event_id": 100_000,
    "user_id": 1_500,
    "doc_id": 5_000,
    "vec_id": 2_000,
}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bigsf/sf1.0"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    def reps(sql_tpl: str, tname: str) -> None:
        parts = [sql_tpl.format(i=i) for i in range(n)]
        union = " UNION ALL ".join(parts)
        con.execute(
            f"COPY ({union}) TO '{out}/{tname}.parquet' (FORMAT PARQUET, CODEC 'snappy')"
        )
        print(tname, con.execute(f"SELECT count(*) FROM '{out}/{tname}.parquet'").fetchone()[0])

    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied")

    reps(
        "SELECT c_custkey + {i}*15000 AS c_custkey, c_name, c_nationkey, c_acctbal,"
        " c_mktsegment FROM '" + SRC + "/customer.parquet'",
        "customer",
    )
    reps(
        "SELECT s_suppkey + {i}*1000 AS s_suppkey, s_name, s_nationkey, s_acctbal"
        " FROM '" + SRC + "/supplier.parquet'",
        "supplier",
    )
    reps(
        "SELECT p_partkey + {i}*20000 AS p_partkey, p_name, p_brand, p_type, p_size,"
        " p_retailprice FROM '" + SRC + "/part.parquet'",
        "part",
    )
    reps(
        "SELECT o_orderkey + {i}*150000 AS o_orderkey, o_custkey + {i}*15000 AS o_custkey,"
        " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
        " FROM '" + SRC + "/orders.parquet'",
        "orders",
    )
    reps(
        "SELECT l_orderkey + {i}*150000 AS l_orderkey, l_partkey + {i}*20000 AS l_partkey,"
        " l_suppkey + {i}*1000 AS l_suppkey, l_linenumber, l_quantity, l_extendedprice,"
        " l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate"
        " FROM '" + SRC + "/lineitem.parquet'",
        "lineitem",
    )
    reps(
        "SELECT event_id + {i}*100000 AS event_id, ts, user_id + {i}*1500 AS user_id,"
        " event_type, value, props FROM '" + SRC + "/events.parquet'",
        "events",
    )
    # replica 0 keeps the exact original text; replicas i>0 prefix every
    # word with r{i} (kills cross-replica shingle overlap, keeps within-
    # replica dup cohorts intact); n_chars recomputed to stay consistent
    doc_tpl = (
        "SELECT doc_id + {i}*5000 AS doc_id,"
        " CASE WHEN {i} = 0 THEN text"
        " ELSE regexp_replace(text, '(\\S+)', 'r{i}\\1', 'g') END AS text,"
        " lang, source,"
        " CASE WHEN {i} = 0 THEN n_chars"
        " ELSE length(regexp_replace(text, '(\\S+)', 'r{i}\\1', 'g')) END AS n_chars"
        " FROM '" + SRC + "/documents.parquet'"
    )
    reps(doc_tpl, "documents")
    # ~35 percent deterministic multiplicative noise per component for i>0:
    # cosine(original, replica) ~ 0.98, below e03's NEARDUP_THRESHOLD=0.99,
    # while cluster structure (cross-label cosine ~0.5) is preserved
    emb_tpl = (
        "SELECT vec_id + {i}*2000 AS vec_id,"
        " CASE WHEN {i} = 0 THEN embedding ELSE"
        " list_transform(embedding, x -> CAST(x * (1.0 +"
        "   (CAST(hash(CAST(round(x*1e6) AS BIGINT) + {i}*7919) % 100001 AS BIGINT) - 50000)"
        "   * 7e-6) AS FLOAT)) END AS embedding,"
        " label FROM '" + SRC + "/embeddings.parquet'"
    )
    reps(emb_tpl, "embeddings")
    with open(os.path.join(out, "_DONE"), "w") as fh:
        fh.write("ok\n")


if __name__ == "__main__":
    main()
