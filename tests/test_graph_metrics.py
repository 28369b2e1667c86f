"""q33 truncated betweenness centrality vs a networkx-based reference.

The oracle attests cross-engine agreement of the path-counting SQL; this
test pins the SEMANTICS: on the bounded hub graph, the emitted values equal
unnormalized betweenness restricted to shortest paths of length ≤ 3,
computed independently with networkx primitives (all_shortest_paths). On a
graph of diameter ≤ 3 that equals nx.betweenness_centrality exactly.
"""

import itertools

import duckdb
import pytest

from citibike_pipeline_spark.operators.advanced import q33_betweenness

nx = pytest.importorskip("networkx")

SF = "/root/testdata/sf0.001"


def _truncated_betweenness(G, max_len=3):
    bc = {v: 0.0 for v in G}
    for s, t in itertools.combinations(sorted(G.nodes), 2):
        if not nx.has_path(G, s, t):
            continue
        if nx.shortest_path_length(G, s, t) > max_len:
            continue
        paths = list(nx.all_shortest_paths(G, s, t))
        for p in paths:
            for v in p[1:-1]:
                bc[v] += 1.0 / len(paths)
    return bc


def test_q33_matches_networkx_truncated_betweenness(spark):
    got = {
        r.node: r.betweenness
        for r in q33_betweenness(spark, SF).collect()
    }
    # independent edge extraction for the SAME node set (the node selection
    # itself is hash-attested by the DuckDB oracle)
    con = duckdb.connect()
    nodes = list(got)
    placeholder = ", ".join(f"'{n}'" for n in nodes)
    edges = con.execute(
        f"""
        SELECT DISTINCT 's' || l_suppkey AS a, 'p' || l_partkey AS b
        FROM '{SF}/lineitem.parquet'
        WHERE 's' || l_suppkey IN ({placeholder})
          AND 'p' || l_partkey IN ({placeholder})
        """
    ).fetchall()
    G = nx.Graph()
    G.add_nodes_from(nodes)
    G.add_edges_from(edges)

    want = _truncated_betweenness(G)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-6), v
    # non-constant signal on the real data
    assert sum(1 for x in got.values() if x > 0) >= 3


def test_q33_equals_full_betweenness_when_diameter_small(spark):
    """If the sf0.001 hub graph has diameter ≤ 3 (it is dense), truncation
    is exact and q33 equals nx.betweenness_centrality(normalized=False)."""
    got = {
        r.node: r.betweenness for r in q33_betweenness(spark, SF).collect()
    }
    con = duckdb.connect()
    placeholder = ", ".join(f"'{n}'" for n in got)
    edges = con.execute(
        f"""
        SELECT DISTINCT 's' || l_suppkey AS a, 'p' || l_partkey AS b
        FROM '{SF}/lineitem.parquet'
        WHERE 's' || l_suppkey IN ({placeholder})
          AND 'p' || l_partkey IN ({placeholder})
        """
    ).fetchall()
    G = nx.Graph()
    G.add_nodes_from(got)
    G.add_edges_from(edges)
    ecc = [
        max(d.values())
        for _, d in (
            (n, dict(nx.single_source_shortest_path_length(G, n)))
            for n in G.nodes
        )
        if d
    ]
    if max(ecc) > 3 or not nx.is_connected(G):
        pytest.skip("hub graph not dense enough for exact equality")
    want = nx.betweenness_centrality(G, normalized=False)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-6), v


def test_d08_clusters_match_networkx_components(spark):
    """d08's bounded-round min-label propagation must have CONVERGED on the
    real corpus: every doc's cluster_id equals the min doc_id of its
    networkx connected component over the same candidate pair graph."""
    from citibike_pipeline_spark.operators.textops import (
        d05_minhash_lsh_pairs,
        d08_dup_clusters,
    )

    sf = "/root/testdata/sf0.01"
    pairs = [(r.doc_a, r.doc_b) for r in
             d05_minhash_lsh_pairs(spark, sf).select("doc_a", "doc_b").collect()]
    G = nx.Graph()
    G.add_edges_from(pairs)
    want = {}
    for comp in nx.connected_components(G):
        root = min(comp)
        for v in comp:
            want[v] = (root, len(comp))
    got = {
        r.doc_id: (r.cluster_id, r.cluster_size)
        for r in d08_dup_clusters(spark, sf).collect()
    }
    assert got == want
    assert len(got) > 100  # real signal: a third of the corpus pairs up
    assert max(s for _, s in got.values()) >= 3  # multi-doc chains exist


def test_q28_two_rounds_equal_full_unroll(spark):
    """The q28 graph is structurally bipartite (supplier src < 2^32 <= part
    dst), so supplier ranks are constant after round 1 and part ranks are a
    pure function of them from round 2 on: every round past 2 is an exact
    identity. This pins the short-circuited production path bit-for-bit
    against the full _PR_ITers unroll the oracle computes."""
    from citibike_pipeline_spark.operators.advanced import q28_pagerank
    from citibike_pipeline_spark.operators.resources import (
        release_query_resources,
    )

    sf = "/root/testdata/sf0.01"
    fast = q28_pagerank(spark, sf).toPandas()
    release_query_resources(spark)
    full = q28_pagerank(spark, sf, _full_unroll=True).toPandas()
    release_query_resources(spark)
    assert fast.equals(full), "2-round short-circuit diverged from full unroll"
