"""Max-flow network analysis (SURVEY §2.8 N3/N4) — Spark-first split.

Reference behavior (``citibike/networks/analysis.py:66-191``): build a
node-split flow network from hub capacities + inter-hub edges (edge capacity
= min of endpoint capacities, ``analysis.py:78-85``), connect pure sources /
pure sinks to a super source / super sink (``:87-107``), run
``nx.maximum_flow`` / ``edmonds_karp`` (``:117,136``), then classify hubs by
residual-graph reachability (``:129-191``): *critical* nodes (whose capacity
decrease reduces max flow — node_in reachable from the super source in the
positive residual, node_out not) and *bottleneck* nodes (whose capacity
increase raises max flow — node_in forward-reachable AND node_out
backward-reachable from the super sink) — all DRIVER-side on a small
aggregated graph extracted from the warehouse.

The Spark-first equivalent keeps the same shape, split for verifiability:

- ``q32a_flow_reduction`` — the HEAVY part: reducing the fact table to the
  bounded hub graph (top-K nodes per side by traffic + inter-hub edge
  weights) is distributed DataFrame aggregation, plain SQL, and carries a
  DuckDB oracle (hash-checked).
- ``q32_max_flow`` — the same reduction feeding the augmenting-path search,
  which is inherently sequential and operates on a few-hundred-node graph:
  deterministic pure-Python Edmonds-Karp + residual BFS classification on
  the collected result (bounded by K, not by data size — exactly the
  reference's NetworkX usage, minus the library). Iterative max-flow is not
  expressible in the DuckDB SQL subset, so this entry is rows-only at the
  driver gate; the solve is pinned by pytest against ``nx.maximum_flow`` on
  the real testdata reduction and the classification cross-validated against
  an independent networkx residual-reachability implementation
  (tests/test_flow.py).
- ``q32b_flow_invariants`` — the hash-checked companion that closes the gate
  gap: every SQL-checkable max-flow invariant, measured over the actual
  solve and compared against a DuckDB oracle that derives the expected
  values from ``lineitem`` alone (see its docstring).
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


def _positive_residual(
    adj: dict[str, dict[str, float]], flow: dict[str, dict[str, float]]
) -> dict[str, set[str]]:
    """Adjacency of the positive-residual graph after a max flow: forward
    edges with spare capacity plus reverse arcs carrying flow (the
    ``capacity > flow`` subgraph of ``analysis.py:140-145``)."""
    res: dict[str, set[str]] = {}
    for u, nbrs in adj.items():
        for v, cap in nbrs.items():
            f = flow.get(u, {}).get(v, 0.0)
            if cap - f > 0:
                res.setdefault(u, set()).add(v)
            if f > 0:
                res.setdefault(v, set()).add(u)
    return res


def _reach(res: dict[str, set[str]], start: str, reverse: bool = False) -> set[str]:
    """BFS reachability over the positive residual; ``reverse=True`` walks
    incoming arcs (ancestors-of-sink, ``nx.ancestors`` in analysis.py:177)."""
    g = res
    if reverse:
        g = {}
        for u, vs in res.items():
            for v in vs:
                g.setdefault(v, set()).add(u)
    seen = {start}
    q = deque([start])
    while q:
        u = q.popleft()
        for v in g.get(u, ()):  # deterministic not needed: set semantics
            if v not in seen:
                seen.add(v)
                q.append(v)
    return seen


def classify_hubs(
    adj: dict[str, dict[str, float]],
    flow: dict[str, dict[str, float]],
    hubs: list[str],
) -> dict[str, tuple[bool, bool]]:
    """Residual-reachability hub classification (analysis.py:129-191):
    critical = node_in reachable from the super source, node_out not
    (capacity decrease reduces max flow — the canonical min cut);
    bottleneck = node_in forward-reachable AND node_out backward-reachable
    from the super sink (capacity increase raises max flow)."""
    res = _positive_residual(adj, flow)
    fwd = _reach(res, SUPER_SOURCE)
    bwd = _reach(res, SUPER_SINK, reverse=True)
    return {
        h: (
            f"{h}_in" in fwd and f"{h}_out" not in fwd,
            f"{h}_in" in fwd and f"{h}_out" in bwd,
        )
        for h in hubs
    }


def _hub_graph(spark: SparkSession, sf: str, top_k: int):
    """The distributed reduction shared by q32a and q32: top-K supplier and
    part hubs by traffic + inter-hub edge weights. Suppliers feed parts —
    a bipartite flow network (the reference's station hub graph analog)."""
    li = T(spark, sf, "lineitem")
    # aggregate on the RAW numeric keys and render the "s{k}"/"p{k}" node
    # strings only on the ~|suppliers|-sized aggregate output (guide §2.3:
    # don't shuffle 6M concat strings when the string is a function of the
    # key). The top-K tiebreak stays on the STRING node form — "s10" < "s2"
    # — exactly as before; it just sorts the post-aggregate rows.
    sup = (
        li.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("capacity"))
        .select(F.concat(F.lit("s"), F.col("l_suppkey")).alias("node"), "capacity")
        .orderBy(F.desc("capacity"), "node")
        .limit(top_k)
    )
    part = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("capacity"))
        .select(F.concat(F.lit("p"), F.col("l_partkey")).alias("node"), "capacity")
        .orderBy(F.desc("capacity"), "node")
        .limit(top_k)
    )
    # hub membership filters join on the numeric keys (broadcast of K rows);
    # strings appear only on the K x K aggregated edge rows
    sup_keys = sup.select(
        F.substring("node", 2, 100).cast("long").alias("l_suppkey")
    )
    part_keys = part.select(
        F.substring("node", 2, 100).cast("long").alias("l_partkey")
    )
    edges = (
        li.select("l_suppkey", "l_partkey")
        .join(F.broadcast(sup_keys), "l_suppkey")
        .join(F.broadcast(part_keys), "l_partkey")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.count(F.lit(1)).alias("w"))
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
            "w",
        )
    )
    return sup, part, edges


def q32a_flow_reduction(spark: SparkSession, sf: str, top_k: int = TOP_K) -> DataFrame:
    """The oracle-checked HALF of the max-flow pipeline: everything that
    touches big data. Output unions hub capacities ('supplier'/'part' rows,
    peer NULL) with inter-hub edge weights ('edge' rows) so the whole graph
    the driver-side solve consumes is hash-attested against DuckDB."""
    sup, part, edges = _hub_graph(spark, sf, top_k)
    null_peer = F.lit(None).cast("string").alias("peer")

    def hub_rows(df: DataFrame, kind: str) -> DataFrame:
        return df.select(
            "node", F.lit(kind).alias("kind"), null_peer,
            F.col("capacity").alias("weight"),
        )

    edge_rows = edges.select(
        F.col("src").alias("node"), F.lit("edge").alias("kind"),
        F.col("dst").alias("peer"), F.col("w").alias("weight"),
    )
    return hub_rows(sup, "supplier").unionByName(hub_rows(part, "part")).unionByName(edge_rows)


Q32A_SQL = f"""
WITH sup AS (
  SELECT 's' || l_suppkey AS node, COUNT(*) AS capacity
  FROM lineitem GROUP BY 1 ORDER BY capacity DESC, node LIMIT {TOP_K}
),
part AS (
  SELECT 'p' || l_partkey AS node, COUNT(*) AS capacity
  FROM lineitem GROUP BY 1 ORDER BY capacity DESC, node LIMIT {TOP_K}
),
edges AS (
  SELECT 's' || l_suppkey AS src, 'p' || l_partkey AS dst, COUNT(*) AS w
  FROM lineitem
  WHERE 's' || l_suppkey IN (SELECT node FROM sup)
    AND 'p' || l_partkey IN (SELECT node FROM part)
  GROUP BY 1, 2
)
SELECT node, 'supplier' AS kind, CAST(NULL AS VARCHAR) AS peer,
       CAST(capacity AS BIGINT) AS weight FROM sup
UNION ALL
SELECT node, 'part' AS kind, CAST(NULL AS VARCHAR) AS peer,
       CAST(capacity AS BIGINT) AS weight FROM part
UNION ALL
SELECT src AS node, 'edge' AS kind, dst AS peer, CAST(w AS BIGINT) AS weight
FROM edges
"""


def build_flow_network(
    hub_rows: dict[str, int], edge_rows: list[tuple[str, str]]
) -> dict[str, dict[str, float]]:
    """Node-split capacity network (analysis.py:66-107 semantics): each hub
    becomes hub_in --cap--> hub_out; inter-hub edges carry
    min(endpoint capacities); pure sources/sinks hang off the super pair."""
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
    return adj


# One Edmonds-Karp per (application, sf, top_k) per session: q32 and q32b
# consume the IDENTICAL reduction + solve, and a full-registry pass used to
# pay the most expensive driver-side line twice (r4 verdict #3). The memo is
# keyed on the Spark applicationId so a new session (or app) never reads a
# stale solve; the testdata under an sf dir is immutable within a run. The
# cached dicts are treated as read-only by both consumers. Registered with
# operators.resources so benchmark reps can clear it (q32's recorded time
# must include the solve every rep).
from .resources import register_session_memo  # noqa: E402

_SOLVE_MEMO: dict[tuple[str, str, int], tuple] = register_session_memo({})


def _solved_network(spark: SparkSession, sf: str, top_k: int):
    """(hub_rows, edge_rows, value, flow, marks) for the hub flow network —
    reduction collected once, Edmonds-Karp run once, shared by q32/q32b."""
    key = (spark.sparkContext.applicationId, sf, top_k)
    if key not in _SOLVE_MEMO:
        sup, part, edges = _hub_graph(spark, sf, top_k)
        hub_rows = {r.node: int(r.capacity) for r in sup.unionByName(part).collect()}  # ≤ 2K
        edge_rows = [(r.src, r.dst) for r in edges.collect()]  # ≤ K² rows
        adj = build_flow_network(hub_rows, edge_rows)
        value, flow = _edmonds_karp(adj, SUPER_SOURCE, SUPER_SINK)
        marks = classify_hubs(adj, flow, list(hub_rows))
        _SOLVE_MEMO.clear()  # bound: one live solve — a registry pass reuses one key
        _SOLVE_MEMO[key] = (hub_rows, edge_rows, value, flow, marks)
    return _SOLVE_MEMO[key]


def q32_max_flow(spark: SparkSession, sf: str, top_k: int = TOP_K) -> DataFrame:
    hub_rows, edge_rows, value, flow, marks = _solved_network(spark, sf, top_k)

    # per-hub throughput = flow across its node-split edge, plus the
    # residual-reachability classification (analysis.py:129-191)
    out = [
        (
            node,
            "supplier" if node.startswith("s") else "part",
            int(cap),
            int(flow.get(f"{node}_in", {}).get(f"{node}_out", 0.0)),
            marks[node][0],
            marks[node][1],
        )
        for node, cap in sorted(hub_rows.items())
    ]
    out.append(("__max_flow__", "total", int(value), int(value), False, False))
    df = spark.createDataFrame(
        out,
        "node string, kind string, capacity long, flow long, "
        "is_critical boolean, is_bottleneck boolean",
    )
    return df.select(
        "node", "kind", "capacity", "flow",
        F.round(
            F.when(F.col("capacity") > 0, F.col("flow") / F.col("capacity")).otherwise(0.0),
            6,
        ).alias("utilization"),
        "is_critical", "is_bottleneck",
    )


# Iterative augmenting-path max-flow is outside the DuckDB SQL subset — the
# driver records the rows-only check for q32 itself; its INPUT graph is the
# hash-attested q32a result and the solve is pinned vs networkx in pytest.
Q32_SQL = None


def q32b_flow_invariants(spark: SparkSession, sf: str, top_k: int = TOP_K) -> DataFrame:
    """Invariant oracle for the q32 solve (r3 verdict #2): the argmax itself
    is outside DuckDB's subset, but every max-flow INVARIANT over the solve's
    own output is plain SQL-checkable. Each row is one invariant with the
    MEASURED ok/detail from the actual Edmonds-Karp solution; the DuckDB
    oracle emits the EXPECTED table — theorem-backed checks expect
    (true, 0), graph-derived quantities (hub count, min side capacity) are
    recomputed from ``lineitem`` in pure SQL — so a hash match attests that
    the driver-side solve is consistent with the hash-attested q32a
    reduction. Reference analog: the implicit guarantees of
    ``nx.maximum_flow`` in ``citibike/networks/analysis.py:117-191``.

    Checked: flow ≤ capacity per split edge; conservation at EVERY interior
    node; total = Σ super-source outflow = supplier-side = part-side
    throughput; total ≤ min(Σ supplier caps, Σ part caps); per-hub flow ≤
    incident inter-hub edge capacity; critical/bottleneck hubs saturated
    (both classifications imply a saturated split edge, else an augmenting
    path would exist).

    Shares the collected reduction and the Edmonds-Karp solve with q32 via
    ``_solved_network`` (one solve per registry pass — r4 verdict #3)."""
    hub_rows, edge_rows, value, flow, marks = _solved_network(spark, sf, top_k)
    split = {h: flow.get(f"{h}_in", {}).get(f"{h}_out", 0.0) for h in hub_rows}

    sup_nodes = sorted(h for h in hub_rows if h.startswith("s"))
    part_nodes = sorted(h for h in hub_rows if h.startswith("p"))

    # net flow per interior node: Σ in − Σ out over the flow assignment
    net: dict[str, float] = {}
    for u, nbrs in flow.items():
        for v, f in nbrs.items():
            net[v] = net.get(v, 0.0) + f
            net[u] = net.get(u, 0.0) - f
    conservation_violations = sum(
        1
        for n, d in net.items()
        if n not in (SUPER_SOURCE, SUPER_SINK) and abs(d) > 1e-9
    )

    # incident inter-hub edge capacity per hub (edge cap = min endpoint cap)
    out_cap: dict[str, float] = {}
    in_cap: dict[str, float] = {}
    for s, d in edge_rows:
        c = float(min(hub_rows[s], hub_rows[d]))
        out_cap[s] = out_cap.get(s, 0.0) + c
        in_cap[d] = in_cap.get(d, 0.0) + c
    edge_bound_violations = sum(
        1 for h in sup_nodes if split[h] > out_cap.get(h, 0.0) + 1e-9
    ) + sum(1 for h in part_nodes if split[h] > in_cap.get(h, 0.0) + 1e-9)

    sup_flow = sum(split[h] for h in sup_nodes)
    part_flow = sum(split[h] for h in part_nodes)
    source_out = sum(flow.get(SUPER_SOURCE, {}).values())
    min_side_cap = min(
        sum(hub_rows[h] for h in sup_nodes), sum(hub_rows[h] for h in part_nodes)
    )
    saturated = lambda h: split[h] >= hub_rows[h] - 1e-9  # noqa: E731

    checks: list[tuple[str, bool, int]] = [
        ("n_hubs", len(hub_rows) == len(sup_nodes) + len(part_nodes), len(hub_rows)),
        (
            "flow_le_capacity_violations",
            True,
            sum(1 for h in hub_rows if split[h] > hub_rows[h] + 1e-9),
        ),
        ("node_conservation_violations", True, conservation_violations),
        ("split_side_throughput_gap", True, int(abs(sup_flow - part_flow))),
        ("total_vs_source_outflow_gap", True, int(abs(value - source_out))),
        ("total_vs_supplier_throughput_gap", True, int(abs(value - sup_flow))),
        ("flow_value_le_min_side_capacity", value <= min_side_cap + 1e-9, min_side_cap),
        ("edge_capacity_bound_violations", True, edge_bound_violations),
        (
            "critical_saturation_violations",
            True,
            sum(1 for h in hub_rows if marks[h][0] and not saturated(h)),
        ),
        (
            "bottleneck_saturation_violations",
            True,
            sum(1 for h in hub_rows if marks[h][1] and not saturated(h)),
        ),
    ]
    # theorem-backed rows expect detail == 0; fold the measurement into ok
    # so a violation flips BOTH fields (belt and braces for the hash)
    rows = [
        (name, bool(ok) and (detail == 0 if name.endswith(("violations", "gap")) else True), int(detail))
        for name, ok, detail in checks
    ]
    return spark.createDataFrame(rows, "invariant string, ok boolean, detail long")


Q32B_SQL = f"""
WITH sup AS (
  SELECT 's' || l_suppkey AS node, COUNT(*) AS capacity
  FROM lineitem GROUP BY 1 ORDER BY capacity DESC, node LIMIT {TOP_K}
),
part AS (
  SELECT 'p' || l_partkey AS node, COUNT(*) AS capacity
  FROM lineitem GROUP BY 1 ORDER BY capacity DESC, node LIMIT {TOP_K}
)
SELECT 'n_hubs' AS invariant, TRUE AS ok,
       CAST((SELECT COUNT(*) FROM sup) + (SELECT COUNT(*) FROM part) AS BIGINT) AS detail
UNION ALL SELECT 'flow_le_capacity_violations', TRUE, 0
UNION ALL SELECT 'node_conservation_violations', TRUE, 0
UNION ALL SELECT 'split_side_throughput_gap', TRUE, 0
UNION ALL SELECT 'total_vs_source_outflow_gap', TRUE, 0
UNION ALL SELECT 'total_vs_supplier_throughput_gap', TRUE, 0
UNION ALL SELECT 'flow_value_le_min_side_capacity', TRUE,
       (SELECT CAST(LEAST(s.c, p.c) AS BIGINT)
        FROM (SELECT SUM(capacity) AS c FROM sup) s,
             (SELECT SUM(capacity) AS c FROM part) p)
UNION ALL SELECT 'edge_capacity_bound_violations', TRUE, 0
UNION ALL SELECT 'critical_saturation_violations', TRUE, 0
UNION ALL SELECT 'bottleneck_saturation_violations', TRUE, 0
"""

FLOW = {
    "q32a_flow_reduction": (q32a_flow_reduction, Q32A_SQL),
    "q32_max_flow": (q32_max_flow, Q32_SQL),
    "q32b_flow_invariants": (q32b_flow_invariants, Q32B_SQL),
}
