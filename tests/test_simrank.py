"""SimRank fixed-iteration kernel: hand oracle, NumPy dense replay,
DuckDB twin, layout independence."""

import pytest
from pyspark.sql import functions as F

from drone_spark.algorithms.simrank import (
    SIM_SCALE, simrank_fixed, simrank_fixed_sql,
)


def _numpy_simrank_fx(rows, iters, c_num, c_den, cap=None):
    """Dense integer replay of the exact floor-division recurrence the
    module defines (NOT float SimRank): s matrix over capped vertices,
    diagonal fixed at SIM_SCALE."""
    inn = {}
    for s, d in set(rows):
        inn.setdefault(d, set()).add(s)
    if cap is not None:
        inn = {v: ps for v, ps in inn.items() if len(ps) <= cap}
    verts = sorted(inn)
    s_prev = {}  # (a,b) a<b -> fx
    for _ in range(iters):
        s_new = {}
        for ai, a in enumerate(verts):
            for b in verts[ai + 1:]:
                tot = 0
                for i in inn[a]:
                    for j in inn[b]:
                        if i == j:
                            tot += SIM_SCALE
                        else:
                            key = (min(i, j), max(i, j))
                            tot += s_prev.get(key, 0)
                v = (c_num * tot) // (c_den * len(inn[a]) * len(inn[b]))
                if v > 0:
                    s_new[(a, b)] = v
        s_prev = s_new
    return s_prev


def _graph_rows():
    # two "citation hubs" with shared parents + a chain
    return [
        (1, 3), (2, 3), (1, 4), (2, 4), (5, 4), (3, 6), (4, 6),
        (3, 7), (4, 7), (6, 8), (7, 9), (1, 5), (9, 3),
    ]


@pytest.mark.parametrize("iters", [1, 2, 3])
def test_simrank_matches_dense_replay(spark, iters):
    rows = _graph_rows()
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {
        (r["a"], r["b"]): r["simrank_fx"]
        for r in simrank_fixed(edges, iters=iters).collect()
    }
    want = _numpy_simrank_fx(rows, iters, 4, 5, cap=64)
    assert got == want


def test_simrank_pair_without_common_parent(spark):
    """I(a)={i}, I(b)={j}, i≠j but s(i,j)>0: the pair must appear at
    iteration 2 (the full-outer-join path)."""
    # parents 1,2 share grandparent 0; children: 1->10, 2->20
    rows = [(0, 1), (0, 2), (1, 10), (2, 20)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {
        (r["a"], r["b"]): r["simrank_fx"]
        for r in simrank_fixed(edges, iters=2).collect()
    }
    want = _numpy_simrank_fx(rows, 2, 4, 5, cap=64)
    assert (10, 20) in got
    assert got == want


def test_simrank_sql_twin_matches_spark(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = _graph_rows()
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = sorted(
        (r["a"], r["b"], r["simrank_fx"])
        for r in simrank_fixed(edges, iters=3, max_in_degree=3).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE base (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO base VALUES (?, ?)", rows)
    sql = simrank_fixed_sql(
        "edges AS (SELECT src, dst FROM base)", iters=3, max_in_degree=3
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_simrank_layout_independent(spark):
    rows = _graph_rows()
    edges = spark.createDataFrame(rows, "src long, dst long")
    a = sorted(simrank_fixed(edges, iters=2).collect())
    b = sorted(
        simrank_fixed(edges.repartition(7, "src"), iters=2).collect()
    )
    assert a == b


def test_simrank_cap_drops_hub_pairs(spark):
    """With cap=1 the shared-parent hub pairs vanish; every surviving
    pair involves only in-degree-1 vertices."""
    rows = _graph_rows()
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {
        (r["a"], r["b"]): r["simrank_fx"]
        for r in simrank_fixed(edges, iters=2, max_in_degree=1).collect()
    }
    want = _numpy_simrank_fx(rows, 2, 4, 5, cap=1)
    assert got == want
