"""Egonet OddBall census, k-core shell densities, JM query likelihood,
and two-term proximity — hand-computed small oracles plus DuckDB twin
replays (the continuation-leg additions; entry keys egonet_oddball /
core_density / lm_jm / term_proximity)."""

import math

import pytest
from pyspark.sql import functions as F  # noqa: F401

from drone_spark.algorithms.kcore import core_density, core_density_sql
from drone_spark.algorithms.linkstats import (
    egonet_features,
    egonet_features_sql,
)
from drone_spark.ops.textstats import (
    lm_jm_topk,
    lm_jm_topk_sql,
    term_proximity,
    term_proximity_sql,
)

KITE = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5)]


# ------------------------------------------------------------- egonet
def test_egonet_kite(spark):
    """Kite + pendant: triangles {1,2,3},{2,3,4}; T = (1,2,2,1,0),
    deg = (2,3,3,3,1). v1's egonet is the K3 {1,2,3} (clique flag);
    v5's egonet is the single edge (trivially a K2 clique); nobody is
    a star (stars need deg ≥ 2 and zero triangles)."""
    e = spark.createDataFrame(KITE, "src long, dst long")
    got = {
        r["vid"]: (
            r["ego_nodes"], r["ego_edges"], r["density_ppm"],
            r["is_clique"], r["is_star"],
        )
        for r in egonet_features(e).collect()
    }
    assert got == {
        1: (3, 3, 1_000_000, 1, 0),
        2: (4, 5, 833_333, 0, 0),
        3: (4, 5, 833_333, 0, 0),
        4: (4, 4, 666_666, 0, 0),
        5: (2, 1, 1_000_000, 1, 0),
    }


def test_egonet_star_center(spark):
    """A pure 3-star: the center has deg 3, zero triangles → star flag;
    ego density = 2·3/(4·3) = 500000 ppm."""
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "src long, dst long"
    )
    got = {
        r["vid"]: (r["ego_edges"], r["density_ppm"], r["is_star"])
        for r in egonet_features(e).collect()
    }
    assert got[1] == (3, 500_000, 1)
    # leaves: egonet = the single spoke edge, a K2 clique
    assert got[2] == (1, 1_000_000, 0)


def test_egonet_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    e = spark.createDataFrame(KITE, "src long, dst long")
    got = sorted(tuple(r) for r in egonet_features(e).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE base (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO base VALUES (?, ?)", KITE)
    want = sorted(
        tuple(r)
        for r in con.execute(
            egonet_features_sql("edges AS (SELECT src, dst FROM base)")
        ).fetchall()
    )
    assert got == want


# ------------------------------------------------------- core density
def test_core_density_k4_path(spark):
    """K4 {1..4} + path 4-5-6 at converged coreness (3,3,3,3,1,1):
    level-3 shell = K4 alone (V=4, E=6, avg deg 3 → 3·10⁶ ppm);
    level-1 shell = whole graph (V=6, E=8). Level 2 is unobserved, so
    no row (its shell equals level 3's)."""
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)],
        "src long, dst long",
    )
    got = {
        r["k"]: (r["n_vertices"], r["n_edges"], r["density_ppm"])
        for r in core_density(e, rounds=6).collect()
    }
    assert got == {
        3: (4, 6, 3_000_000),
        1: (6, 8, 2_666_666),
    }


def test_core_density_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = KITE + [(5, 6), (6, 7), (7, 5)]
    e = spark.createDataFrame(rows, "src long, dst long")
    got = sorted(tuple(r) for r in core_density(e, rounds=4).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE base (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO base VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            core_density_sql("edges AS (SELECT src, dst FROM base)", rounds=4)
        ).fetchall()
    )
    assert got == want


# ----------------------------------------------------------------- JM
def test_lm_jm_hand_scores(spark):
    """Two docs, query {a, c}, λ=0.5; collection a:2 b:2 c:1 of N=5.
    doc1 "a b a": ln(.5·2/3 + .5·2/5) + ln(.5·1/5);
    doc2 "b c":   ln(.5·2/5)          + ln(.5·1/2 + .5·1/5)."""
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["score"]
        for r in lm_jm_topk(docs, ["a", "c"], k=10).collect()
    }
    want1 = round(math.log(0.5 * 2 / 3 + 0.5 * 2 / 5) + math.log(0.1), 6)
    want2 = round(math.log(0.2) + math.log(0.35), 6)
    assert got == {1: pytest.approx(want1), 2: pytest.approx(want2)}


def test_lm_jm_oov_drops_and_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = [
        (1, "the quick fox jumps"),
        (2, "quick quick brown"),
        (3, "lazy dog sleeps"),
        (4, "   "),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # 'zzz' is OOV → contributes nothing (dropped, not -inf)
    got = sorted(
        tuple(r) for r in lm_jm_topk(docs, ["quick", "zzz"], k=10).collect()
    )
    assert all(math.isfinite(s) for _, s in got)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(lm_jm_topk_sql(["quick", "zzz"], k=10)).fetchall()
    )
    assert got == want


# ---------------------------------------------------------- proximity
def test_term_proximity_hand(spark):
    """doc1: a@1, b@4, a@5 → min gap 1 (b@4 vs a@5); doc2 adjacent →
    gap 1; doc3 has only one of the terms → excluded."""
    docs = spark.createDataFrame(
        [
            (1, "x a x x b a"),
            (2, "b a"),
            (3, "a a a"),
            (4, "a x x b"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["min_gap"], r["n_a"], r["n_b"])
        for r in term_proximity(docs, "a", "b", k=10).collect()
    }
    assert got == {1: (1, 2, 1), 2: (1, 1, 1), 4: (3, 1, 1)}


def test_term_proximity_merged_order_is_exact(spark):
    """Same-term runs between an optimal pair can't hide it: the
    closest cross-term pair is adjacent in merged order."""
    docs = spark.createDataFrame(
        [(1, "a x a x x b b x a")], "doc_id long, text string"
    )
    [row] = term_proximity(docs, "a", "b", k=10).collect()
    # positions: a@0, a@2, b@5, b@6, a@8 → min |a-b| = |6-8| = 2
    assert (row["min_gap"], row["n_a"], row["n_b"]) == (2, 3, 2)


def test_term_proximity_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = [
        (1, "x a x x b a"),
        (2, "b a"),
        (3, "a a a"),
        (4, "a x x b"),
        (5, "B  a"),  # normalizer lowercases + collapses whitespace
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in term_proximity(docs, "a", "b", k=10).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(
        tuple(r) for r in con.execute(term_proximity_sql("a", "b", k=10)).fetchall()
    )
    assert got == want
