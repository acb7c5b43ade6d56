"""k-truss / edge-support / maximal-independent-set correctness.

Oracles are brute-force Python over small graphs (itertools, no graph
libs) plus structural invariants and the engine-wide determinism
contract (result independent of input partitioning).
"""

import itertools

import pytest
from pyspark.sql import functions as F

from drone_spark.algorithms.mis import maximal_independent_set
from drone_spark.algorithms.trusses import canonical_edges, edge_support, k_truss


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _brute_support(pairs):
    es = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    adj = {}
    for u, v in es:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return {(u, v): len(adj[u] & adj[v]) for u, v in es}


def _brute_ktruss(pairs, k):
    es = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    while True:
        sup = _brute_support(es)
        keep = {e for e in es if sup[e] >= k - 2}
        if keep == es:
            return es
        es = keep


def _brute_lexfirst_mis(pairs, pri):
    """Greedy MIS in (pri, id) order — the fixpoint mis.py computes."""
    vs = sorted({x for p in pairs for x in p if p[0] != p[1]},
                key=lambda v: (pri[v], v))
    adj = {}
    for u, v in {tuple(sorted(p)) for p in pairs if p[0] != p[1]}:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out, dead = set(), set()
    for v in vs:
        if v not in dead:
            out.add(v)
            dead |= adj.get(v, set())
            dead.add(v)
    return out


# two 4-cliques sharing the edge (3,4), plus a pendant path
CLIQUES = (
    list(itertools.combinations([1, 2, 3, 4], 2))
    + list(itertools.combinations([3, 4, 5, 6], 2))
    + [(6, 7), (7, 8)]
)


def test_edge_support_matches_brute(spark):
    got = {
        (r.u, r.v): r.support
        for r in edge_support(_edges_df(spark, CLIQUES)).collect()
    }
    assert got == _brute_support(CLIQUES)


def test_edge_support_keeps_zero_support_edges(spark):
    got = {
        (r.u, r.v): r.support
        for r in edge_support(_edges_df(spark, [(1, 2), (2, 3)])).collect()
    }
    assert got == {(1, 2): 0, (2, 3): 0}


@pytest.mark.parametrize("k", [3, 4])
def test_ktruss_matches_brute(spark, k):
    got = {(r.u, r.v) for r in k_truss(_edges_df(spark, CLIQUES), k).collect()}
    assert got == _brute_ktruss(CLIQUES, k)


def test_ktruss_4_of_shared_cliques_drops_path(spark):
    got = {(r.u, r.v) for r in k_truss(_edges_df(spark, CLIQUES), 4).collect()}
    # both 4-cliques survive (every edge in a 4-clique closes 2 triangles),
    # the pendant path does not
    assert (6, 7) not in got and (7, 8) not in got
    assert (1, 2) in got and (5, 6) in got


def test_ktruss_within_truss_support_invariant(spark, small_edges):
    k = 4
    res = k_truss(small_edges, k)
    bad = res.where(F.col("support") < k - 2).count()
    assert bad == 0
    # support column is the support *within* the truss: recompute
    again = edge_support(res.select("u", "v"))
    merged = res.join(again.withColumnRenamed("support", "s2"), ["u", "v"])
    assert merged.where(F.col("support") != F.col("s2")).count() == 0


def test_ktruss_maximality(spark, small_edges):
    """No dropped edge could re-enter: every edge of the original graph
    absent from the truss has, within truss ∪ {edge}, support < k-2."""
    k = 4
    truss = {(r.u, r.v) for r in k_truss(small_edges, k).collect()}
    alle = {(r.u, r.v) for r in canonical_edges(small_edges).collect()}
    adj = {}
    for u, v in truss:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    for u, v in alle - truss:
        common = adj.get(u, set()) & adj.get(v, set())
        assert len(common) < k - 2, f"edge {(u, v)} would survive in the truss"


def test_mis_matches_lexfirst_brute(spark):
    df = _edges_df(spark, CLIQUES)
    pri = {
        r.vid: r.pri
        for r in canonical_edges(df)
        .select(F.explode(F.array("u", "v")).alias("vid"))
        .distinct()
        .select(
            "vid",
            F.conv(F.substring(F.md5(F.col("vid").cast("string")), 1, 15), 16, 10)
            .cast("long")
            .alias("pri"),
        )
        .collect()
    }
    got = {r.vid for r in maximal_independent_set(df).collect()}
    assert got == _brute_lexfirst_mis(CLIQUES, pri)


def test_mis_independent_and_maximal(spark, small_edges):
    mis = maximal_independent_set(small_edges)
    m = mis.persist()
    sym = (
        small_edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    # independence: no edge with both endpoints in the set
    viol = (
        sym.join(m.withColumnRenamed("vid", "src"), "src")
        .join(m.withColumnRenamed("vid", "dst"), "dst")
        .count()
    )
    assert viol == 0
    # maximality: every non-member vertex has a member neighbor
    verts = sym.select(F.col("src").alias("vid")).union(
        sym.select(F.col("dst").alias("vid"))
    ).distinct()
    nonmem = verts.join(m, "vid", "left_anti")
    both = sym.union(sym.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    covered = (
        nonmem.join(both.withColumnRenamed("src", "vid"), "vid")
        .join(m.withColumnRenamed("vid", "dst"), "dst")
        .select("vid")
        .distinct()
    )
    assert nonmem.join(covered, "vid", "left_anti").count() == 0
    m.unpersist()


def test_mis_layout_independent(spark):
    df = _edges_df(spark, CLIQUES)
    a = sorted(r.vid for r in maximal_independent_set(df).collect())
    b = sorted(
        r.vid
        for r in maximal_independent_set(df.repartition(7, "dst")).collect()
    )
    assert a == b


def test_mis_empty_graph(spark):
    out = maximal_independent_set(_edges_df(spark, [(5, 5)]))
    assert out.count() == 0
