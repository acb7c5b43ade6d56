"""Randomized brute-force parity for the leg-2 structural operators:
egonet census, 4-cycle count, Collective Influence, walk entropy rate,
core-shell density — Spark plans vs plain-Python references on seeded
Erdős–Rényi-ish graphs (the tests/oracles.py FIXTURES-F4 convention:
the two formulations share no code, so agreement pins the join/window
edge cases)."""

import itertools
import math
import random

import pytest

from drone_spark.algorithms.kcore import core_density
from drone_spark.algorithms.linkstats import (
    collective_influence,
    egonet_features,
    square_count,
    walk_entropy_rate,
)


def _gen(seed, n=12, p=0.35):
    rng = random.Random(seed)
    edges = [
        (u, v)
        for u in range(1, n + 1)
        for v in range(u + 1, n + 1)
        if rng.random() < p
    ]
    # keep no isolated-graph degenerate case
    if not edges:
        edges = [(1, 2)]
    return edges


def _adj(edges):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return adj


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_egonet_random(spark, seed):
    edges = _gen(seed)
    adj = _adj(edges)
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["vid"]: (r["ego_nodes"], r["ego_edges"], r["is_clique"], r["is_star"])
        for r in egonet_features(e).collect()
    }
    for v, nbrs in adj.items():
        n = len(nbrs) + 1
        inner = sum(
            1 for a, b in itertools.combinations(sorted(nbrs), 2) if b in adj[a]
        )
        ee = len(nbrs) + inner
        want = (
            n,
            ee,
            1 if 2 * ee == n * (n - 1) else 0,
            1 if inner == 0 and len(nbrs) >= 2 else 0,
        )
        assert got[v] == want, (seed, v)


@pytest.mark.parametrize("seed", [4, 5, 6])
def test_square_count_random(spark, seed):
    edges = _gen(seed, n=10)
    adj = _adj(edges)
    e = spark.createDataFrame(edges, "src long, dst long")
    [r] = square_count(e, max_degree=10_000).collect()
    # brute force: ordered 4-tuples of distinct vertices forming a
    # cycle a-b-c-d-a; each C4 appears 8 times (4 rotations × 2 dirs)
    nodes = sorted(adj)
    cnt = 0
    for a, b, c, d in itertools.permutations(nodes, 4):
        if b in adj[a] and c in adj[b] and d in adj[c] and a in adj[d]:
            cnt += 1
    assert r["n_squares"] == cnt // 8, seed


@pytest.mark.parametrize("seed", [7, 8, 9])
def test_collective_influence_random(spark, seed):
    edges = _gen(seed)
    adj = _adj(edges)
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["vid"]: r["ci"]
        for r in collective_influence(e, k=100, max_degree=10_000).collect()
    }
    for v, nbrs in adj.items():
        two_hop = set()
        for m in nbrs:
            two_hop |= adj[m]
        two_hop -= nbrs
        two_hop.discard(v)
        want = (len(nbrs) - 1) * sum(len(adj[u]) - 1 for u in two_hop)
        assert got[v] == want, (seed, v)


@pytest.mark.parametrize("seed", [10, 11])
def test_walk_entropy_random(spark, seed):
    edges = _gen(seed)
    adj = _adj(edges)
    e = spark.createDataFrame(edges, "src long, dst long")
    [r] = walk_entropy_rate(e).collect()
    two_e = sum(len(n) for n in adj.values())
    want = sum(len(n) * math.log(len(n)) for n in adj.values()) / two_e
    assert r["entropy_rate"] == pytest.approx(round(want, 6))
    assert r["n_vertices"] == len(adj)
    assert r["n_edges"] == two_e // 2


def _coreness_peel(adj):
    """Matula–Beck peeling — the true core numbers."""
    deg = {v: len(n) for v, n in adj.items()}
    core = {}
    alive = dict(deg)
    k = 0
    while alive:
        v = min(alive, key=lambda x: (alive[x], x))
        k = max(k, alive[v])
        core[v] = k
        for u in adj[v]:
            if u in alive and u != v:
                alive[u] -= 1
        del alive[v]
    return core


@pytest.mark.parametrize("seed", [12, 13, 14])
def test_core_density_random_converged(spark, seed):
    """With enough H-rounds the shell densities match the true
    (peeling) coreness decomposition computed independently."""
    edges = _gen(seed, n=11)
    adj = _adj(edges)
    core = _coreness_peel(adj)
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["k"]: (r["n_vertices"], r["n_edges"])
        for r in core_density(e, rounds=12).collect()
    }
    want = {}
    for k in sorted(set(core.values())):
        if k < 1:
            continue
        vs = {v for v, c in core.items() if c >= k}
        es = sum(1 for u, v in edges if u in vs and v in vs and u != v)
        want[k] = (len(vs), es)
    assert got == want, seed
