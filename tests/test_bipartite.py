"""Bipartiteness via the double-cover CC run — hand graphs with known
odd/even cycle structure, DuckDB twin."""

import pytest
from pyspark.sql import functions as F

from drone_spark.algorithms.cc import bipartite_check, bipartite_check_sql


def test_even_cycle_is_bipartite(spark, engine):
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    rows = bipartite_check(spark, engine, edges, run_id="t_bp1").collect()
    assert [(r["component"], r["n_vertices"], r["is_bipartite"]) for r in rows] == [
        (0, 4, True)
    ]


def test_odd_cycle_is_not_bipartite(spark, engine):
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    rows = bipartite_check(spark, engine, edges, run_id="t_bp2").collect()
    assert [(r["component"], r["n_vertices"], r["is_bipartite"]) for r in rows] == [
        (0, 3, False)
    ]


def test_mixed_components(spark, engine):
    """Component {0..3} = C4 (bipartite), {10,11,12} = C3 (odd),
    {20,21} = single edge (bipartite), {30..34} = C5 (odd)."""
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0),
         (10, 11), (11, 12), (12, 10),
         (20, 21),
         (30, 31), (31, 32), (32, 33), (33, 34), (34, 30)],
        "src long, dst long",
    )
    got = {
        r["component"]: (r["n_vertices"], r["is_bipartite"])
        for r in bipartite_check(spark, engine, edges, run_id="t_bp3").collect()
    }
    assert got == {
        0: (4, True), 10: (3, False), 20: (2, True), 30: (5, False),
    }


def test_tree_plus_cross_edge(spark, engine):
    """A path 0-1-2-3-4 is bipartite; adding the chord (0,2) creates a
    triangle → not bipartite."""
    path = [(i, i + 1) for i in range(4)]
    e1 = spark.createDataFrame(path, "src long, dst long")
    r1 = bipartite_check(spark, engine, e1, run_id="t_bp4a").collect()
    assert r1[0]["is_bipartite"] is True
    e2 = spark.createDataFrame(path + [(0, 2)], "src long, dst long")
    r2 = bipartite_check(spark, engine, e2, run_id="t_bp4b").collect()
    assert r2[0]["is_bipartite"] is False


def test_bipartite_sql_twin(spark, engine):
    duckdb = pytest.importorskip("duckdb")
    rows = [(0, 1), (1, 2), (2, 3), (3, 0), (10, 11), (11, 12), (12, 10),
            (5, 6), (6, 7), (7, 5), (7, 8)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = sorted(
        tuple(r)
        for r in bipartite_check(spark, engine, edges, run_id="t_bp5").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE base (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO base VALUES (?, ?)", rows)
    sql = bipartite_check_sql("edges AS (SELECT src, dst FROM base)")
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want
