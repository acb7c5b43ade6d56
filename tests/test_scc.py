"""SCC + bowtie vs a local Tarjan oracle."""

import pytest
from pyspark.sql import functions as F

from drone_spark.algorithms.scc import bowtie, strongly_connected_components


def tarjan_scc(edges, vertices):
    """Iterative Tarjan, min-member labels — the in-test oracle."""
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    label = {}
    counter = [0]

    for root in sorted(vertices):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            succs = adj.get(v, [])
            for i in range(pi, len(succs)):
                w = succs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if pi < len(succs):
                pass
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    label[w] = m
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    return label


def _run_scc(spark, engine, edges, run_id):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = strongly_connected_components(
        spark, engine, df, run_id=run_id, num_parts=4
    )
    return {r["vid"]: r["scc_id"] for r in out.collect()}


HANDCRAFTED = [
    # cycle A {1,2,3} -> path 4 -> cycle B {5,6} -> tendril 7
    (1, 2), (2, 3), (3, 1),
    (3, 4), (4, 5),
    (5, 6), (6, 5),
    (6, 7),
    # self-loop vertex: singleton SCC
    (8, 8),
    # back-edge making {9,10,11} one SCC hanging off cycle B
    (6, 9), (9, 10), (10, 11), (11, 9),
]


def test_scc_handcrafted(spark, engine):
    got = _run_scc(spark, engine, HANDCRAFTED, "scc_hand")
    verts = {v for e in HANDCRAFTED for v in e}
    want = tarjan_scc([e for e in HANDCRAFTED if e[0] != e[1]], verts)
    assert got == want
    # spot-check the known components
    assert got[1] == got[2] == got[3] == 1
    assert got[5] == got[6] == 5
    assert got[9] == got[10] == got[11] == 9
    assert got[4] == 4 and got[7] == 7 and got[8] == 8


def test_scc_random_vs_tarjan(spark, engine):
    import random

    rng = random.Random(20260817)
    n = 300
    edges = sorted({
        (rng.randrange(n), rng.randrange(n)) for _ in range(450)
    })
    edges = [(s, d) for s, d in edges if s != d]
    verts = {v for e in edges for v in e}
    want = tarjan_scc(edges, verts)
    got = _run_scc(spark, engine, edges, "scc_rand")
    assert got == want
    # non-trivial instance: at least one multi-vertex SCC
    from collections import Counter

    assert max(Counter(want.values()).values()) >= 2


def test_scc_layout_independent(spark, engine):
    df = spark.createDataFrame(HANDCRAFTED, "src long, dst long")
    a = strongly_connected_components(
        spark, engine, df.repartition(1), run_id="scc_l1", num_parts=4
    )
    b = strongly_connected_components(
        spark, engine, df.repartition(7, "dst"), run_id="scc_l7", num_parts=4
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_bowtie_handcrafted(spark, engine):
    # IN(1) -> CORE {2,3,4} -> OUT(5 -> 6); 7 disconnected; 8 -> 1 is IN
    edges = [
        (1, 2),
        (2, 3), (3, 4), (4, 2),
        (4, 5), (5, 6),
        (8, 1),
        (7, 7),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = bowtie(spark, engine, df, run_id="bt_hand", num_parts=4)
    got = {r["vid"]: r["cls"] for r in out.collect()}
    assert got == {
        1: "IN", 2: "CORE", 3: "CORE", 4: "CORE",
        5: "OUT", 6: "OUT", 7: "OTHER", 8: "IN",
    }


def test_bowtie_ties_break_on_scc_id(spark, engine):
    # two SCCs of equal size 2: {1,2} and {5,6} — core must be scc_id 1
    edges = [(1, 2), (2, 1), (5, 6), (6, 5), (2, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = bowtie(spark, engine, df, run_id="bt_tie", num_parts=4)
    got = {r["vid"]: r["cls"] for r in out.collect()}
    assert got == {1: "CORE", 2: "CORE", 5: "OUT", 6: "OUT"}
