"""Stress centrality: brute-force all-shortest-paths replay, DuckDB
twin, determinism."""

import hashlib
from collections import deque

import pytest
from pyspark.sql import functions as F

from drone_spark.algorithms.centrality import (
    stress_centrality, stress_centrality_sql,
)


def _md5_sources(verts, k):
    return sorted(verts, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v))[:k]


def _brute_stress(rows, n_sources, max_depth):
    """Enumerate ALL shortest paths (≤ max_depth) from each sampled
    source via BFS-DAG DFS; count interior visits per vertex."""
    adj = {}
    verts = set()
    for s, d in set(rows):
        adj.setdefault(s, set()).add(d)
        verts.update((s, d))
    stress = {}
    for s in _md5_sources(verts, n_sources):
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= max_depth:
                continue
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        # enumerate all shortest paths via DFS over the BFS DAG
        def paths_from(u):
            yield (u,)
            for w in adj.get(u, ()):
                if dist.get(w) == dist[u] + 1:
                    for p in paths_from(w):
                        yield (u,) + p

        for p in paths_from(s):
            for interior in p[1:-1]:
                stress[interior] = stress.get(interior, 0) + 1
    return {v: c for v, c in stress.items() if c > 0}


GRAPH = [
    (1, 2), (2, 3), (3, 4), (1, 5), (5, 3), (2, 5), (4, 6), (3, 6),
    (6, 7), (7, 8), (5, 9), (9, 4), (8, 1), (2, 9),
]


def test_stress_matches_brute_force(spark):
    edges = spark.createDataFrame(GRAPH, "src long, dst long")
    got = {
        r["vid"]: r["stress"]
        for r in stress_centrality(edges, n_sources=3, max_depth=5).collect()
    }
    assert got == _brute_stress(GRAPH, 3, 5)


def test_stress_diamond_counts_multiplicity(spark):
    """s→{a,b}→t: t is reached by 2 shortest paths; a and b each carry
    1; with a 4th vertex beyond t the σ multiplies through."""
    rows = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {
        r["vid"]: r["stress"]
        for r in stress_centrality(edges, n_sources=5, max_depth=4).collect()
    }
    assert got == _brute_stress(rows, 5, 4)
    # source 0: paths through 3 = σ(3)·N(3) = 2·1; through 1 = 1·2...
    # the brute replay is the ground truth; spot-check vertex 3 ≥ 2
    assert got[3] >= 2


def test_stress_depth_cap_binds(spark):
    """A long chain: with max_depth=2 only 1-hop-interior paths count."""
    rows = [(i, i + 1) for i in range(8)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {
        r["vid"]: r["stress"]
        for r in stress_centrality(edges, n_sources=8, max_depth=2).collect()
    }
    assert got == _brute_stress(rows, 8, 2)


def test_stress_sql_twin_matches_spark(spark):
    duckdb = pytest.importorskip("duckdb")
    edges = spark.createDataFrame(GRAPH, "src long, dst long")
    got = sorted(
        tuple(r)
        for r in stress_centrality(edges, n_sources=4, max_depth=6).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE base (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO base VALUES (?, ?)", GRAPH)
    sql = stress_centrality_sql(
        "edges AS (SELECT src, dst FROM base)", n_sources=4, max_depth=6
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_stress_layout_independent(spark):
    edges = spark.createDataFrame(GRAPH, "src long, dst long")
    a = sorted(stress_centrality(edges, 3, 4).collect())
    b = sorted(
        stress_centrality(edges.repartition(9, "dst"), 3, 4).collect()
    )
    assert a == b
