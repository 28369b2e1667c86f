"""Max-flow network analysis (SURVEY §2.8 N3/N4) — Spark-first split.

Reference behavior (``citibike/networks/analysis.py:66-127``): build a
node-split flow network from hub capacities + inter-hub edges (edge capacity
= min of endpoint capacities, ``analysis.py:78-85``), connect pure sources /
pure sinks to a super source / super sink (``:87-107``), and run
``nx.maximum_flow`` / ``edmonds_karp`` (``:117,136``) — all DRIVER-side on a
small aggregated graph extracted from the warehouse.

The Spark-first equivalent keeps the same shape: the heavy part — reducing
the fact table to a bounded hub graph (top-K nodes by traffic + their edge
weights) — is distributed DataFrame aggregation; the augmenting-path search,
which is inherently sequential and operates on a few-hundred-node graph,
runs as deterministic pure-Python Edmonds-Karp on the collected result
(bounded by K, not by data size — exactly the reference's NetworkX usage,
minus the library). No oracle: iterative augmenting-path max-flow is not
expressible in the DuckDB SQL subset, so the driver records the rows-only
check for this entry.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import T

TOP_K = 40  # hubs per side — bounds the driver-side graph at 2K nodes

SUPER_SOURCE = "super_source"
SUPER_SINK = "super_sink"
_INF = float("inf")


def _edmonds_karp(adj: dict[str, dict[str, float]], s: str, t: str):
    """Deterministic Edmonds-Karp (BFS over sorted adjacency). Returns
    (max_flow_value, flow dict[u][v])."""
    flow = {u: {v: 0.0 for v in nbrs} for u, nbrs in adj.items()}
    # residual capacity helper over forward + implicit reverse edges
    def residual(u, v):
        cap = adj.get(u, {}).get(v, 0.0)
        return cap - flow.get(u, {}).get(v, 0.0) + flow.get(v, {}).get(u, 0.0)

    neighbors: dict[str, list[str]] = {}
    for u, nbrs in adj.items():
        neighbors.setdefault(u, []).extend(nbrs)
        for v in nbrs:
            neighbors.setdefault(v, []).append(u)
    neighbors = {u: sorted(set(vs)) for u, vs in neighbors.items()}

    total = 0.0
    while True:
        # BFS for the shortest augmenting path
        parent = {s: None}
        q = deque([s])
        while q and t not in parent:
            u = q.popleft()
            for v in neighbors.get(u, []):
                if v not in parent and residual(u, v) > 0:
                    parent[v] = u
                    q.append(v)
        if t not in parent:
            return total, flow
        # bottleneck along the path
        path = []
        v = t
        while parent[v] is not None:
            path.append((parent[v], v))
            v = parent[v]
        aug = min(residual(u, v) for u, v in path)
        for u, v in path:
            back = min(flow.get(v, {}).get(u, 0.0), aug)
            if back > 0:  # cancel reverse flow first
                flow[v][u] -= back
            fwd = aug - back
            if fwd > 0:
                flow.setdefault(u, {}).setdefault(v, 0.0)
                flow[u][v] += fwd
        total += aug


def q32_max_flow(spark: SparkSession, sf: str, top_k: int = TOP_K) -> DataFrame:
    li = T(spark, sf, "lineitem")

    # -- distributed reduction to the bounded hub graph --------------------
    sup = (
        li.groupBy(F.concat(F.lit("s"), F.col("l_suppkey")).alias("node"))
        .agg(F.count(F.lit(1)).alias("capacity"))
        .orderBy(F.desc("capacity"), "node")
        .limit(top_k)
    )
    part = (
        li.groupBy(F.concat(F.lit("p"), F.col("l_partkey")).alias("node"))
        .agg(F.count(F.lit(1)).alias("capacity"))
        .orderBy(F.desc("capacity"), "node")
        .limit(top_k)
    )
    hubs = sup.unionByName(part)
    edges = (
        li.select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
        )
        .join(F.broadcast(sup.select(F.col("node").alias("src"))), "src")
        .join(F.broadcast(part.select(F.col("node").alias("dst"))), "dst")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )

    hub_rows = {r.node: int(r.capacity) for r in hubs.collect()}  # ≤ 2K rows
    edge_rows = [(r.src, r.dst) for r in edges.collect()]          # ≤ K² rows

    # -- node-split capacity network (analysis.py:66-107 semantics) --------
    adj: dict[str, dict[str, float]] = {}
    for node, cap in hub_rows.items():
        adj.setdefault(f"{node}_in", {})[f"{node}_out"] = float(cap)
    for src, dst in edge_rows:
        cap = float(min(hub_rows[src], hub_rows[dst]))
        adj.setdefault(f"{src}_out", {})[f"{dst}_in"] = cap
    # bipartite: suppliers are pure sources, parts pure sinks
    for node in hub_rows:
        if node.startswith("s"):
            adj.setdefault(SUPER_SOURCE, {})[f"{node}_in"] = _INF
        else:
            adj.setdefault(f"{node}_out", {})[SUPER_SINK] = _INF

    value, flow = _edmonds_karp(adj, SUPER_SOURCE, SUPER_SINK)

    # per-hub throughput = flow across its node-split edge
    out = [
        (
            node,
            "supplier" if node.startswith("s") else "part",
            int(cap),
            int(flow.get(f"{node}_in", {}).get(f"{node}_out", 0.0)),
        )
        for node, cap in sorted(hub_rows.items())
    ]
    out.append(("__max_flow__", "total", int(value), int(value)))
    df = spark.createDataFrame(
        out, "node string, kind string, capacity long, flow long"
    )
    return df.select(
        "node", "kind", "capacity", "flow",
        F.round(
            F.when(F.col("capacity") > 0, F.col("flow") / F.col("capacity")).otherwise(0.0),
            6,
        ).alias("utilization"),
    )


# Iterative augmenting-path max-flow is outside the DuckDB SQL subset — the
# driver records the rows-only check for this entry (the documented weaker
# gate for non-SQL-expressible ops).
Q32_SQL = None

FLOW = {
    "q32_max_flow": (q32_max_flow, Q32_SQL),
}
