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


def brute_ppr(edges, seeds, d=0.85, n_iter=10):
    e = sorted(set(edges))
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    out = {}
    for a, _ in e:
        out[a] = out.get(a, 0) + 1
    sset = set(seeds) & set(nodes)
    t = {v: (1.0 / len(sset) if v in sset else 0.0) for v in nodes}
    rank = dict(t)
    for _ in range(n_iter):
        dangling = sum(r for v, r in rank.items() if v not in out)
        contrib = {v: 0.0 for v in nodes}
        for a, b in e:
            contrib[b] += rank[a] / out[a]
        rank = {v: (1.0 - d) * t[v] + d * (contrib[v] + dangling * t[v]) for v in nodes}
    return rank


def test_personalized_pagerank_matches_brute(spark):
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (3, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for seeds in ([1], [1, 4], [1, 99]):  # absent seed 99 is ignored
        got = {
            r.node: r.rank
            for r in graph.pagerank(df, n_iter=10, seeds=seeds).collect()
        }
        want = brute_ppr(edges, seeds)
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-12), (seeds, v)
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_personalized_pagerank_localizes_mass(spark):
    # two disjoint 3-cycles; seeding in one leaves the other at ZERO rank
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in graph.pagerank(df, seeds=[1]).collect()}
    assert got[10] == got[11] == got[12] == 0.0
    # all mass stays in the seeded component (which node inside the cycle
    # holds most at a finite iteration count is walk-phase-dependent)
    assert min(got[1], got[2], got[3]) > 0
    assert got[1] + got[2] + got[3] == pytest.approx(1.0, abs=1e-9)
    with pytest.raises(ValueError):
        graph.pagerank(df, seeds=[999])
