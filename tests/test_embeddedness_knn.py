"""Edge embeddedness / local bridges and average-neighbor-degree —
hand oracles, a brute-force common-neighbor replay, DuckDB twins."""

import pytest
from pyspark.sql import functions as F

from drone_spark.algorithms.linkstats import (
    avg_neighbor_degree, avg_neighbor_degree_sql,
    edge_embeddedness, edge_embeddedness_sql,
)


def _brute_embeddedness(rows):
    nbrs = {}
    for s, d in rows:
        if s == d:
            continue
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    out = {}
    seen = set()
    for s, d in rows:
        if s == d:
            continue
        lo, hi = min(s, d), max(s, d)
        if (lo, hi) in seen:
            continue
        seen.add((lo, hi))
        out[(lo, hi)] = len(nbrs[lo] & nbrs[hi])
    return out


def test_embeddedness_kite(spark):
    """Kite: (2,3) sits in two triangles → emb 2; (4,5) is the pendant
    local bridge → emb 0."""
    rows = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {
        (r["src"], r["dst"]): (r["embeddedness"], r["is_local_bridge"])
        for r in edge_embeddedness(edges).collect()
    }
    assert got[(2, 3)] == (2, False)
    assert got[(4, 5)] == (0, True)
    assert {k: v[0] for k, v in got.items()} == _brute_embeddedness(rows)


def test_embeddedness_rank_vs_id_order(spark):
    """Triangle {1,2,3} where the degree orientation disagrees with id
    order (deg(2)=4 > deg(3)=2, so the oriented closing edge is 3→2):
    the wedge enumeration must still credit it."""
    rows = [(1, 2), (1, 3), (2, 3), (2, 8), (2, 9)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {
        (r["src"], r["dst"]): r["embeddedness"]
        for r in edge_embeddedness(edges).collect()
    }
    assert got == _brute_embeddedness(rows)
    assert got[(1, 2)] == 1 and got[(1, 3)] == 1 and got[(2, 3)] == 1


def test_embeddedness_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = [(i, (i * 5) % 11) for i in range(1, 11)] + [
        (1, 2), (2, 3), (3, 1), (3, 4), (4, 1)
    ]
    rows = [(s, d) for s, d in rows if s != d]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = sorted(tuple(r) for r in edge_embeddedness(edges).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE base (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO base VALUES (?, ?)", rows)
    sql = edge_embeddedness_sql("edges AS (SELECT src, dst FROM base)")
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_avg_neighbor_degree_star(spark):
    """Star center 0 with leaves 1..4: knn(0) = 1, knn(leaf) = 4."""
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long"
    )
    got = {
        r["vid"]: (r["deg"], r["knn_ppm"])
        for r in avg_neighbor_degree(edges).collect()
    }
    assert got[0] == (4, 1_000_000)
    for leaf in range(1, 5):
        assert got[leaf] == (1, 4_000_000)


def test_avg_neighbor_degree_quotient_floor(spark):
    """Path 1-2-3-4: knn(2) = (1+2)/2 → 1_500_000 ppm exactly;
    knn(1) = 2_000_000."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    got = {
        r["vid"]: r["knn_ppm"]
        for r in avg_neighbor_degree(edges).collect()
    }
    assert got == {
        1: 2_000_000, 2: 1_500_000, 3: 1_500_000, 4: 2_000_000,
    }


def test_avg_neighbor_degree_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (2, 6)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = sorted(tuple(r) for r in avg_neighbor_degree(edges).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE base (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO base VALUES (?, ?)", rows)
    sql = avg_neighbor_degree_sql("edges AS (SELECT src, dst FROM base)")
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want
