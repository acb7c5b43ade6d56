"""Configuration-model rewiring and seeded label spreading."""

import duckdb
import pytest
from pyspark.sql import functions as F

from drone_spark.algorithms.labelspread import label_spread, label_spread_sql
from drone_spark.algorithms.nullmodel import (
    configuration_rewire,
    configuration_rewire_sql,
)


@pytest.fixture(scope="module")
def ring(spark):
    """8-ring plus chords — enough stubs for a non-trivial pairing."""
    edges = [(i, (i + 1) % 8) for i in range(8)] + [(0, 4), (2, 6)]
    return spark.createDataFrame(edges, "src long, dst long")


def test_rewire_preserves_stub_budget_and_is_layout_independent(spark, ring):
    """The null graph's degree sum never exceeds the original's (equal
    when no self-loop/multi-edge collapses), vertices are conserved,
    and the output is identical on a different partitioning."""
    null = configuration_rewire(ring)
    sym_deg = lambda df: {
        r["vid"]: r["d"]
        for r in df.select("src", "dst")
        .unionAll(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .groupBy(F.col("src").alias("vid")).agg(F.count(F.lit(1)).alias("d"))
        .collect()
    }
    d0, d1 = sym_deg(ring), sym_deg(null.select("src", "dst"))
    assert set(d1) <= set(d0)
    assert sum(d1.values()) <= sum(d0.values())
    assert sum(d1.values()) >= sum(d0.values()) - 8  # few collapses on 24 stubs
    a = sorted(map(tuple, null.collect()))
    b = sorted(map(tuple, configuration_rewire(
        ring.repartition(7, "dst")).collect()))
    assert a == b


def test_rewire_matches_duckdb_twin(spark, ring):
    got = sorted(map(tuple, configuration_rewire(ring).collect()))
    rows = [tuple(r) for r in ring.collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE r(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO r VALUES (?, ?)", rows)
    sql = "WITH " + configuration_rewire_sql(
        "gedges AS (SELECT src, dst FROM r)"
    )
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want
    # composition form: final_cte yields the same edge set
    sql2 = ("WITH " + configuration_rewire_sql(
        "gedges AS (SELECT src, dst FROM r)", final_cte="ne")
        + " SELECT src, dst FROM ne")
    assert sorted(map(tuple, con.execute(sql2).fetchall())) == want


def test_label_spread_hand_computed(spark):
    """Path 0-1-2-3 with seed labels 0→5, 3→9: round 1 labels 1←5,
    2←9; round 2 keeps them (majority among {5,9} ties to smaller on
    vertex 1? check: v1 neighbors {0:5, 2:9} → tie → 5; v2 neighbors
    {1:5, 3:9} → tie → 5?? — no: round-2 v2 sees labels of round-1
    state (1→5, 3→9) → tie → min = 5)."""
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0, 5), (3, 9)], "vid long, label long")
    r1 = {r["vid"]: r["label"]
          for r in label_spread(edges, seeds, rounds=1).collect()}
    assert r1 == {0: 5, 1: 5, 2: 9, 3: 9}
    r2 = {r["vid"]: r["label"]
          for r in label_spread(edges, seeds, rounds=2).collect()}
    assert r2 == {0: 5, 1: 5, 2: 5, 3: 9}


def test_label_spread_unreached_stay_null_and_seeds_clamped(spark):
    edges = spark.createDataFrame(
        [(0, 1), (5, 6)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0, 3), (1, 4)], "vid long, label long")
    got = {r["vid"]: r["label"]
           for r in label_spread(edges, seeds, rounds=3).collect()}
    assert got == {0: 3, 1: 4, 5: None, 6: None}


def test_label_spread_matches_duckdb_twin(spark):
    edges = [(i, (i * 3 + 1) % 20) for i in range(40)]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = (
        e.select(F.col("src").alias("vid")).union(
            e.select(F.col("dst").alias("vid"))
        ).distinct().where(F.col("vid") % 4 == 0)
        .select("vid", (F.col("vid") % 3).cast("long").alias("label"))
    )
    got = sorted(map(tuple, label_spread(e, seeds, rounds=2).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE r(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO r VALUES (?, ?)", edges)
    sql = "WITH " + label_spread_sql(
        "gedges AS (SELECT src, dst FROM r)",
        "seeds AS (SELECT vid, CAST(vid % 3 AS BIGINT) AS label FROM "
        "(SELECT DISTINCT src AS vid FROM gedges UNION "
        "SELECT DISTINCT dst FROM gedges) WHERE vid % 4 = 0)",
        rounds=2,
    )
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want


def test_empty_graph_edge_cases(spark):
    """Empty inputs return empty (never raise): rewiring, sweep,
    modularity scalar, label spreading, funnel with an absent stage."""
    from drone_spark.algorithms.linkstats import louvain_sweep, modularity_q
    from drone_spark.ops.events import funnel

    empty = spark.createDataFrame([], "src long, dst long")
    assert configuration_rewire(empty).count() == 0
    assert louvain_sweep(empty).count() == 0
    assert modularity_q(
        empty, spark.createDataFrame([], "vid long, community long")) == 0.0
    seeds = spark.createDataFrame([(1, 1)], "vid long, label long")
    assert label_spread(empty, seeds, rounds=2).count() == 0
    ev = spark.createDataFrame(
        [(1, 1, __import__("datetime").datetime(2024, 1, 1), "view")],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    got = {r["stage"]: r["n_users"]
           for r in funnel(ev, ["view", "nonexistent"]).collect()}
    assert got == {"view": 1, "nonexistent": 0}
