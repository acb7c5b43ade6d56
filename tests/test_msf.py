"""Borůvka MSF vs in-test Kruskal under the same (w, u, v) total order."""

import random

import pytest
from pyspark.sql import functions as F

from drone_spark.algorithms.msf import minimum_spanning_forest


def _kruskal(n_ids, edge_list):
    """Reference MSF: Kruskal over (w, u, v)-sorted canonical edges."""
    best = {}
    for s, d, w in edge_list:
        if s == d:
            continue
        u, v = min(s, d), max(s, d)
        if (u, v) not in best or w < best[(u, v)]:
            best[(u, v)] = w
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = set()
    for (u, v), w in sorted(best.items(), key=lambda kv: (kv[1], kv[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            forest.add((u, v, w))
    return forest


def _run(spark, edge_list):
    df = spark.createDataFrame(edge_list, "src long, dst long, w double")
    got = {
        (r["u"], r["v"], r["w"])
        for r in minimum_spanning_forest(df).collect()
    }
    # vertex universe = endpoints of non-self-loop edges (self-loop-only
    # ids never enter the algorithm)
    real = {
        x
        for s, d, _ in edge_list
        if s != d
        for x in (s, d)
    }
    want = _kruskal(real, edge_list)
    assert got == want
    return got


def test_msf_known_graph(spark):
    # two components: a 4-cycle with a cheap chord, plus an edge pair
    edges = [
        (1, 2, 1.0), (2, 3, 4.0), (3, 4, 2.0), (4, 1, 3.0), (1, 3, 5.0),
        (10, 11, 7.0), (11, 12, 6.0), (10, 12, 8.0),
    ]
    got = _run(spark, edges)
    assert got == {
        (1, 2, 1.0), (3, 4, 2.0), (1, 4, 3.0),
        (11, 12, 6.0), (10, 11, 7.0),
    }


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_msf_random_graphs_match_kruskal(spark, seed):
    rng = random.Random(seed)
    n = 60
    edges = []
    for _ in range(140):
        s, d = rng.randrange(n), rng.randrange(n)
        # integer weights mod 7: heavy duplication exercises the
        # (w, u, v) tie-breaking total order
        edges.append((s, d, float(rng.randrange(7))))
    # parallel edges with different weights too
    edges += [(s, d, w + 1.0) for s, d, w in edges[:15]]
    _run(spark, edges)


def test_msf_forest_size_is_v_minus_components(spark):
    rng = random.Random(7)
    edges = [
        (rng.randrange(40), rng.randrange(40), float(rng.randrange(100)))
        for _ in range(60)
    ]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    forest = minimum_spanning_forest(df).collect()

    real = {x for s, d, _ in edges if s != d for x in (s, d)}
    parent = {i: i for i in real}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d, _ in edges:
        if s != d:
            parent[find(s)] = find(d)
    n_comp = len({find(i) for i in real})
    assert len(forest) == len(real) - n_comp


def test_msf_empty_and_selfloop_only(spark):
    df = spark.createDataFrame([(5, 5, 1.0)], "src long, dst long, w double")
    assert minimum_spanning_forest(df).count() == 0
