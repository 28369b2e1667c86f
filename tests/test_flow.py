"""Max-flow operator (q32): kernel cross-validated against networkx, and
output invariants on the real testdata reduction."""

import random

import pytest

from citibike_pipeline_spark.operators.flow import (
    SUPER_SINK,
    SUPER_SOURCE,
    _edmonds_karp,
    q32_max_flow,
)

nx = pytest.importorskip("networkx")


def _random_network(seed: int):
    rng = random.Random(seed)
    n = rng.randint(4, 10)
    nodes = [f"n{i}" for i in range(n)]
    adj = {}
    for u in nodes:
        for v in nodes:
            if u != v and rng.random() < 0.35:
                adj.setdefault(u, {})[v] = float(rng.randint(1, 20))
    adj.setdefault("S", {})
    adj.setdefault("T", {})
    for u in nodes[: n // 2]:
        adj["S"][u] = float(rng.randint(5, 30))
    for u in nodes[n // 2 :]:
        adj.setdefault(u, {})["T"] = float(rng.randint(5, 30))
    return adj


@pytest.mark.parametrize("seed", [1, 7, 23, 99, 1234])
def test_edmonds_karp_matches_networkx(seed):
    adj = _random_network(seed)
    value, _ = _edmonds_karp(adj, "S", "T")
    G = nx.DiGraph()
    for u, nbrs in adj.items():
        for v, c in nbrs.items():
            G.add_edge(u, v, capacity=c)
    want, _ = nx.maximum_flow(G, "S", "T")
    assert value == pytest.approx(want)


def test_q32_output_invariants(spark):
    df = q32_max_flow(spark, "/root/testdata/sf0.001", top_k=15).toPandas()
    total = df[df.node == "__max_flow__"]
    assert len(total) == 1
    max_flow = int(total.iloc[0].capacity)
    assert max_flow > 0
    hubs = df[df.node != "__max_flow__"]
    assert (hubs.flow <= hubs.capacity).all()
    # conservation: each side's node-split throughput carries the full flow
    assert int(hubs[hubs.kind == "supplier"].flow.sum()) == max_flow
    assert int(hubs[hubs.kind == "part"].flow.sum()) == max_flow
    assert SUPER_SOURCE not in set(hubs.node) and SUPER_SINK not in set(hubs.node)


# -- round 3: pinned solve + residual classification (analysis.py:129-191) --

from citibike_pipeline_spark.operators.flow import (  # noqa: E402
    _hub_graph,
    build_flow_network,
    classify_hubs,
)


def _nx_graph(adj):
    G = nx.DiGraph()
    for u, nbrs in adj.items():
        for v, c in nbrs.items():
            G.add_edge(u, v, capacity=c)
    return G


def _nx_classify(adj, hubs):
    """Independent reimplementation of the reference's residual-reachability
    classification via networkx (analysis.py:129-191): positive-residual
    subgraph of the edmonds_karp residual network, descendants of the super
    source / ancestors of the super sink."""
    G = _nx_graph(adj)
    residual = nx.algorithms.flow.edmonds_karp(G, SUPER_SOURCE, SUPER_SINK)
    positive = residual.edge_subgraph(
        [
            (u, v)
            for u, v, d in residual.edges(data=True)
            if d["capacity"] > d["flow"]
        ]
    )
    fwd = nx.descendants(positive, SUPER_SOURCE) | {SUPER_SOURCE}
    bwd = nx.ancestors(positive, SUPER_SINK) | {SUPER_SINK}
    return {
        h: (
            f"{h}_in" in fwd and f"{h}_out" not in fwd,
            f"{h}_in" in fwd and f"{h}_out" in bwd,
        )
        for h in hubs
    }


def _random_hub_network(seed: int):
    """Random bipartite hub graph in q32's shape (suppliers -> parts)."""
    rng = random.Random(seed)
    ns, np_ = rng.randint(3, 8), rng.randint(3, 8)
    hubs = {f"s{i}": rng.randint(2, 30) for i in range(ns)}
    hubs.update({f"p{i}": rng.randint(2, 30) for i in range(np_)})
    edges = [
        (f"s{i}", f"p{j}")
        for i in range(ns)
        for j in range(np_)
        if rng.random() < 0.45
    ]
    # every side needs at least one edge for a nonzero flow problem
    if not edges:
        edges = [("s0", "p0")]
    return hubs, edges


@pytest.mark.parametrize("seed", [3, 11, 42, 77, 2026, 31337])
def test_classification_matches_networkx(seed):
    hubs, edges = _random_hub_network(seed)
    adj = build_flow_network(hubs, edges)
    value, flow = _edmonds_karp(adj, SUPER_SOURCE, SUPER_SINK)
    G = _nx_graph(adj)
    want_value, _ = nx.maximum_flow(G, SUPER_SOURCE, SUPER_SINK)
    assert value == pytest.approx(want_value)
    got = classify_hubs(adj, flow, list(hubs))
    want = _nx_classify(adj, list(hubs))
    assert got == want


def test_q32_solve_pinned_on_testdata(spark):
    """The exact solve on the real sf0.001 reduction: max-flow value equals
    nx.maximum_flow on the identical network, and the emitted
    critical/bottleneck columns equal the networkx residual classification."""
    sup, part, edges = _hub_graph(spark, "/root/testdata/sf0.001", 15)
    hub_rows = {r.node: int(r.capacity) for r in sup.unionByName(part).collect()}
    edge_rows = [(r.src, r.dst) for r in edges.collect()]
    adj = build_flow_network(hub_rows, edge_rows)

    want_value, _ = nx.maximum_flow(_nx_graph(adj), SUPER_SOURCE, SUPER_SINK)
    df = q32_max_flow(spark, "/root/testdata/sf0.001", top_k=15).toPandas()
    got_value = int(df[df.node == "__max_flow__"].iloc[0].capacity)
    assert got_value == int(want_value)

    want_marks = _nx_classify(adj, list(hub_rows))
    hubs = df[df.node != "__max_flow__"]
    got_marks = {
        r.node: (bool(r.is_critical), bool(r.is_bottleneck))
        for r in hubs.itertuples()
    }
    assert got_marks == want_marks
    # the classification must carry signal on the real data, not be constant
    assert any(c for c, _ in want_marks.values()) or any(
        b for _, b in want_marks.values()
    )


def test_q32b_invariant_oracle_all_ok(spark):
    """The q32b companion entry (r3 verdict #2): every SQL-checkable
    max-flow invariant must hold on the real testdata solve — ok=True on
    each row, zero for every violation/gap counter, and the value bound
    row carrying the graph-derived min side capacity."""
    from citibike_pipeline_spark.operators.flow import q32b_flow_invariants

    pdf = q32b_flow_invariants(spark, "/root/testdata/sf0.001").toPandas()
    assert len(pdf) == 10
    assert pdf.ok.all(), pdf[~pdf.ok]
    counters = pdf[pdf.invariant.str.endswith(("violations", "gap"))]
    assert (counters.detail == 0).all(), counters
    assert int(pdf[pdf.invariant == "n_hubs"].iloc[0].detail) > 0
    assert int(
        pdf[pdf.invariant == "flow_value_le_min_side_capacity"].iloc[0].detail
    ) > 0
