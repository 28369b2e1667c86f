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
