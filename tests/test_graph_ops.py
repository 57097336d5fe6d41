"""Graph-operator tests: pagerank vs a Python power-iteration reference,
BFS vs hand-computed depths, triangles on a known graph."""

from __future__ import annotations

import pytest

from svs_spark.operators.graph import bfs_depths, pagerank, triangle_count


@pytest.fixture(scope="module")
def small_edges(spark):
    # K4 minus edge (3,4), plus a pendant 5 and an isolated pair 6-7
    rows = [
        (1, 1, 2, 0, None, False),
        (2, 1, 3, 0, None, False),
        (3, 1, 4, 0, None, False),
        (4, 2, 3, 0, None, False),
        (5, 2, 4, 0, None, False),
        (6, 4, 5, 0, None, False),
        (7, 6, 7, 0, None, False),
    ]
    return spark.createDataFrame(
        rows,
        "edge_id long, src long, dst long, rel long, weight double, directed boolean",
    )


def test_triangles(spark, small_edges):
    tris = sorted(
        (r["a"], r["b"], r["c"]) for r in triangle_count(small_edges).collect()
    )
    assert tris == [(1, 2, 3), (1, 2, 4)]


def test_bfs_depths(spark, small_edges):
    got = {
        r["node"]: r["depth"]
        for r in bfs_depths(small_edges, source=1, max_depth=6).collect()
    }
    assert got == {1: 0, 2: 1, 3: 1, 4: 1, 5: 2}  # 6,7 unreachable


def test_pagerank_matches_power_iteration(spark, small_edges):
    got = {
        r["node"]: r["rank"] for r in pagerank(small_edges, iterations=15).collect()
    }
    # python reference on the symmetrized graph
    adj = {}
    for _, s, d, *_ in [tuple(r) for r in small_edges.collect()]:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    nodes = sorted(adj)
    n = len(nodes)
    ranks = {v: 1.0 / n for v in nodes}
    for _ in range(15):
        new = {}
        for v in nodes:
            inflow = sum(ranks[u] / len(adj[u]) for u in nodes if v in adj[u])
            new[v] = (1 - 0.85) / n + 0.85 * inflow
        ranks = new
    assert set(got) == set(ranks)
    for v in nodes:
        assert abs(got[v] - ranks[v]) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_lpa_two_cliques(spark):
    """Two disjoint triangles converge to one community each, labeled
    by the clique's smallest node id."""
    from svs_spark.operators.graph import lpa_communities

    rows = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {
        r.node: r.community
        for r in lpa_communities(edges, iterations=3).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_lpa_deterministic_and_total(spark, small_edges):
    from svs_spark.operators.graph import lpa_communities

    e = small_edges.select("src", "dst")
    a = sorted(lpa_communities(e, 3).collect())
    b = sorted(lpa_communities(e, 3).collect())
    assert a == b
    nodes = {r.node for r in a}
    assert nodes == {1, 2, 3, 4, 5, 6, 7}
    # the isolated pair 6-7 must form its own community
    comm = {r.node: r.community for r in a}
    assert comm[6] == comm[7]
    assert comm[6] not in {comm[n] for n in (1, 2, 3, 4, 5)}
