"""PageRank (pipeline/graph.py): parity with a pure-Python power
iteration, dangling-mass handling, and mass conservation."""

import pytest

from tiny_search_engine_spark.pipeline import graph


def brute_pagerank(edges, d=0.85, n_iter=10):
    e = sorted(set(edges))
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    n = len(nodes)
    out = {}
    for a, _ in e:
        out[a] = out.get(a, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        dangling = sum(r for v, r in rank.items() if v not in out)
        contrib = {v: 0.0 for v in nodes}
        for a, b in e:
            contrib[b] += rank[a] / out[a]
        rank = {
            v: (1.0 - d) / n + d * (contrib[v] + dangling / n) for v in nodes
        }
    return rank


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)],  # cycle + feeder
        [(1, 2), (2, 3), (3, 4)],  # chain: node 4 is dangling
        [(1, 2), (1, 2), (2, 1)],  # duplicate edge must count once
    ],
)
def test_pagerank_matches_brute(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in graph.pagerank(df, n_iter=10).collect()}
    want = brute_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_hub_outranks_leaf(spark):
    # everyone points at node 0; node 0 points at node 1
    edges = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in graph.pagerank(df, n_iter=10).collect()}
    # the hub's sole endorsee absorbs its whole mass and tops the ranking;
    # the hub itself is second; plain leaves share the floor
    order = sorted(got, key=got.get, reverse=True)
    assert order[:2] == [1, 0]
    assert got[0] > got[2] and got[2] == pytest.approx(got[5])


def test_pagerank_empty(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert graph.pagerank(df).count() == 0
