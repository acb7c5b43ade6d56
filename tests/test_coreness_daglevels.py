"""Coreness (H-operator iteration) and condensation DAG levels —
hand-computed small-graph oracles plus the DuckDB twin replay.

Coreness reference values checked against the Matula-Beck definition
directly (peel to fixpoint by hand); the H-iteration converges to the
same numbers (Lü et al. 2016), and the fixed-round prefix is what the
entry query pins.
"""

import pytest
from pyspark.sql import functions as F

from drone_spark.algorithms.kcore import coreness_h, coreness_h_sql
from drone_spark.algorithms.scc import condensation_levels


# ------------------------------------------------------------ coreness
def test_coreness_kite_converged(spark):
    """Kite + pendant: triangles {1,2,3},{2,3,4} share (2,3); 5 hangs
    off 4. Core numbers: 1..4 → 2 (the two-triangle block is a 2-core),
    5 → 1. deg = (2,3,3,3,1); two H rounds reach the fixpoint."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5)],
        "src long, dst long",
    )
    out = {
        r["vid"]: r["coreness"]
        for r in coreness_h(edges, rounds=4).collect()
    }
    assert out == {1: 2, 2: 2, 3: 2, 4: 2, 5: 1}


def test_coreness_clique_plus_path(spark):
    """K4 {1,2,3,4} with a path 4-5-6: clique coreness 3, path 1."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)],
        "src long, dst long",
    )
    out = {
        r["vid"]: r["coreness"]
        for r in coreness_h(edges, rounds=6).collect()
    }
    assert out == {1: 3, 2: 3, 3: 3, 4: 3, 5: 1, 6: 1}


def test_coreness_monotone_and_bounded_by_degree(spark):
    """Each H round is non-increasing and stays ≥ true coreness: the
    1-round prefix dominates the 4-round prefix pointwise, and both
    dominate the converged values."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6),
         (6, 7), (7, 5)],
        "src long, dst long",
    )
    r1 = {r["vid"]: r["coreness"] for r in coreness_h(edges, 1).collect()}
    r4 = {r["vid"]: r["coreness"] for r in coreness_h(edges, 4).collect()}
    assert set(r1) == set(r4)
    assert all(r1[v] >= r4[v] for v in r1)


def test_coreness_sql_twin_matches_spark(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6),
            (6, 4), (6, 7)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {
        r["vid"]: r["coreness"]
        for r in coreness_h(edges, rounds=3).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE base (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO base VALUES (?, ?)", rows)
    sql = coreness_h_sql("edges AS (SELECT src, dst FROM base)", rounds=3)
    want = {vid: c for vid, c in con.execute(sql).fetchall()}
    assert got == want


def test_coreness_layout_independent(spark):
    """Same values under a different partitioning of the edge table."""
    rows = [(i, (i * 7) % 23 + 100) for i in range(40)] + [
        (1, 2), (2, 3), (3, 1)
    ]
    edges = spark.createDataFrame(rows, "src long, dst long")
    a = sorted(coreness_h(edges, 2).collect())
    b = sorted(coreness_h(edges.repartition(13, "dst"), 2).collect())
    assert a == b


# ----------------------------------------------------- condensation DAG
def test_dag_levels_two_cycles_chain(spark, engine):
    """Cycle {1,2} → bridge → cycle {3,4} → tail 5:
    condensation is scc(1) → scc(3) → scc(5), levels 0/1/2."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3), (4, 5)],
        "src long, dst long",
    )
    out = {
        r["vid"]: (r["scc_id"], r["level"])
        for r in condensation_levels(
            spark, engine, edges, run_id="t_dag1"
        ).collect()
    }
    assert out == {
        1: (1, 0), 2: (1, 0), 3: (3, 1), 4: (3, 1), 5: (5, 2),
    }


def test_dag_levels_longest_path_not_shortest(spark, engine):
    """Diamond with a long arm: 1→2→3→4 and 1→4. level(4) must be 3
    (the LONGEST path), not 1."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "src long, dst long"
    )
    out = {
        r["vid"]: r["level"]
        for r in condensation_levels(
            spark, engine, edges, run_id="t_dag2"
        ).collect()
    }
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}


def test_dag_levels_all_one_scc(spark, engine):
    """A single big cycle condenses to one node at level 0."""
    n = 6
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    rows = condensation_levels(
        spark, engine, edges, run_id="t_dag3"
    ).collect()
    assert {r["scc_id"] for r in rows} == {0}
    assert {r["level"] for r in rows} == {0}
    assert len(rows) == n
