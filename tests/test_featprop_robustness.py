"""Feature propagation, rich club, attack robustness — hand oracles."""

import pytest
from pyspark.sql import functions as F

from drone_spark.algorithms.featprop import (
    FEAT_SCALE,
    feature_propagation,
    quantize_features,
)
from drone_spark.algorithms.linkstats import rich_club
from drone_spark.algorithms.robustness import attack_robustness


def test_quantize_features_floor_semantics(spark):
    emb = spark.createDataFrame(
        [(1, [0.5, -1.25])], "vec_id long, embedding array<float>"
    )
    rows = {(r["id"], r["dim"]): r["f_fx"] for r in quantize_features(emb).collect()}
    assert rows == {(1, 0): 500000, (1, 1): -1250000}  # floor, incl. negative


def test_feature_propagation_hand_oracle(spark):
    """Graph 1→2, 3→2 with x1=[1.0], x2=[0.0], x3=[0.5]:
    h'(2) = (0 + 10⁶ + 5·10⁵) div (1+2) = 500000; 1 and 3 unchanged
    (no in-edges: (x+0) div 1)."""
    emb = spark.createDataFrame(
        [(1, [1.0]), (2, [0.0]), (3, [0.5])],
        "vec_id long, embedding array<float>",
    )
    e = spark.createDataFrame([(1, 2), (3, 2)], "src long, dst long")
    out = {r["id"]: r["f_fx"] for r in feature_propagation(emb, e).collect()}
    assert out == {1: FEAT_SCALE, 2: 500000, 3: 500000}


def test_feature_propagation_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    from drone_spark.algorithms.featprop import feature_propagation_sql

    vecs = [(i, [0.1 * i, -0.3 * i, 1.0]) for i in range(10)]
    e_rows = [(i, (i * 3 + 1) % 10) for i in range(10)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    e = spark.createDataFrame(e_rows, "src long, dst long")
    got = sorted(
        map(tuple, feature_propagation(emb, e, rounds=2).collect())
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", vecs)
    con.execute("CREATE TABLE base (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO base VALUES (?, ?)", e_rows)
    sql = "WITH " + feature_propagation_sql(
        "edges AS (SELECT src, dst FROM base)", rounds=2
    ).removeprefix("WITH ")
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want


def test_rich_club_hand_oracle(spark):
    """K4 on {1,2,3,4} (all deg 3) + pendant 5 on 4 (deg(4)=4, deg(5)=1):
    k=1: club {1,2,3,4} (deg>1), edges among = 6 K4 edges → φ = 2·6/12 = 1
    k=3: club {4} → <2 members → 0
    k=2: club {1,2,3,4} → same as k=1."""
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    e = spark.createDataFrame(k4 + [(4, 5)], "src long, dst long")
    out = {r["k"]: r for r in rich_club(e, thresholds=(1, 2, 3)).collect()}
    assert out[1]["n_club"] == 4 and out[1]["club_edges"] == 6
    assert out[1]["phi_ppm"] == 1000000
    assert out[2]["phi_ppm"] == 1000000
    assert out[3]["n_club"] == 1 and out[3]["phi_ppm"] == 0


def test_attack_robustness_star_plus_triangle(spark, engine):
    """Hub star 0-{1,2,3,4} plus separate triangle {10,11,12}:
    budget 0: one 5-vertex component + one 3-vertex → giant 5
    budget 1: hub 0 removed → star leaves lose all edges (vanish from
    the edge-induced graph); only the triangle remains → giant 3."""
    e = spark.createDataFrame(
        [(0, i) for i in (1, 2, 3, 4)] + [(10, 11), (11, 12), (10, 12)],
        "src long, dst long",
    )
    out = {
        r["budget"]: r
        for r in attack_robustness(
            spark, engine, e, budgets=(0, 1), run_id="t_rob"
        ).collect()
    }
    assert (out[0]["n_vertices"], out[0]["n_components"], out[0]["giant_size"]) == (8, 2, 5)
    assert (out[1]["n_vertices"], out[1]["n_components"], out[1]["giant_size"]) == (3, 1, 3)


def test_featprop_richclub_plans_stay_jvm_side(spark):
    emb = spark.createDataFrame(
        [(1, [1.0]), (2, [0.0])], "vec_id long, embedding array<float>"
    )
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    for df in (feature_propagation(emb, e), rich_club(e, thresholds=(1,))):
        plan = df._jdf.queryExecution().executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEvalPython",
                       "FlatMapGroupsInPandas", "MapInPandas"):
            assert marker not in plan
