"""SCAN structural clustering, log-odds keyness, spelling variants,
and MMR diversified retrieval — hand oracles + DuckDB twin replays
(entry keys scan_clusters / log_odds_keyness / spell_variants /
mmr_topk)."""

import math

import pytest
from pyspark.sql import functions as F  # noqa: F401

from drone_spark.algorithms.linkstats import (
    scan_clusters,
    scan_clusters_sql,
    scan_core_edges,
)
from drone_spark.ops.corpusstats import (
    log_odds_keyness,
    log_odds_keyness_sql,
    spell_variants,
    spell_variants_sql,
)
from drone_spark.ops.similarity import mmr_topk, mmr_topk_sql

# two K4s joined by a weak bridge, plus a pendant
TWO_K4 = [
    (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
    (5, 6), (5, 7), (5, 8), (6, 7), (6, 8), (7, 8),
    (4, 5), (8, 9),
]


# --------------------------------------------------------------- SCAN
def test_scan_two_k4(spark, engine):
    """At ε²=0.49, μ=3: every K4-internal edge passes (σ² = 16/16 = 1
    for inner pairs, 16/20 = 0.8 for edges touching a bridge endpoint),
    the bridge (4,5) fails (cn=0 → σ² = 4/25 = 0.16), the pendant edge
    (8,9) fails (σ² = 4/10 = 0.4). Every K4 vertex keeps 3 ε-edges →
    all 8 are cores; clusters = the two K4s labeled by min vid; 9 is
    not a core."""
    e = spark.createDataFrame(TWO_K4, "src long, dst long")
    got = {
        r["vid"]: r["cluster"]
        for r in scan_clusters(spark, engine, e, run_id="t_scan").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 5, 8: 5}


def test_scan_eps_edges_exact_filter(spark):
    """The squared-ε filter is exact: edge (3,4) has cn=2, closed degs
    4·5 → σ² = 16/20 = 0.8; it must pass at ε² = 0.8 (16/20) and fail
    at ε² just above (81/100)."""
    e = spark.createDataFrame(TWO_K4, "src long, dst long")
    ok_pass, _ = scan_core_edges(e, eps2_num=80, eps2_den=100)
    ok_fail, _ = scan_core_edges(e, eps2_num=81, eps2_den=100)
    pairs_pass = {(r["u"], r["v"]) for r in ok_pass.collect()}
    pairs_fail = {(r["u"], r["v"]) for r in ok_fail.collect()}
    assert (3, 4) in pairs_pass
    assert (3, 4) not in pairs_fail
    # (1,2): σ² = 16/16 = 1 passes even at ε² = 1
    ok_one, _ = scan_core_edges(e, eps2_num=1, eps2_den=1)
    assert (1, 2) in {(r["u"], r["v"]) for r in ok_one.collect()}


def test_scan_sql_twin(spark, engine):
    duckdb = pytest.importorskip("duckdb")
    e = spark.createDataFrame(TWO_K4, "src long, dst long")
    got = sorted(
        tuple(r)
        for r in scan_clusters(spark, engine, e, run_id="t_scan2").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE base (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO base VALUES (?, ?)", TWO_K4)
    want = sorted(
        tuple(r)
        for r in con.execute(
            scan_clusters_sql("edges AS (SELECT src, dst FROM base)")
        ).fetchall()
    )
    assert got == want


# ------------------------------------------------------------ keyness
def test_keyness_hand(spark):
    """Two docs, V=2, α=0.5: z for 'a' computed from the Monroe et al.
    formulas by hand."""
    docs = spark.createDataFrame(
        [(1, "a a b", "en"), (2, "a b b b", "de")],
        "doc_id long, text string, lang string",
    )
    got = {
        r["token"]: (r["y_a"], r["y_b"], r["z"])
        for r in log_odds_keyness(docs, min_count=1).collect()
    }
    d_a = math.log(2.5 / (3 + 1 - 2 - 0.5)) - math.log(1.5 / (4 + 1 - 1 - 0.5))
    z_a = round(d_a / math.sqrt(1 / 2.5 + 1 / 1.5), 6)
    d_b = math.log(1.5 / (3 + 1 - 1 - 0.5)) - math.log(3.5 / (4 + 1 - 3 - 0.5))
    z_b = round(d_b / math.sqrt(1 / 1.5 + 1 / 3.5), 6)
    assert got["a"][:2] == (2, 1) and got["a"][2] == pytest.approx(z_a)
    assert got["b"][:2] == (1, 3) and got["b"][2] == pytest.approx(z_b)


def test_keyness_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = [
        (1, "the quick fox the the", "en"),
        (2, "quick quick brown fox", "en"),
        (3, "der schnelle fuchs der", "de"),
        (4, "le renard rapide fox quick", "fr"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = sorted(
        tuple(r) for r in log_odds_keyness(docs, min_count=2).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(log_odds_keyness_sql(min_count=2)).fetchall()
    )
    assert got == want


# ----------------------------------------------------- spell variants
def test_spell_variants_hand(spark):
    """'qwick' (1 occurrence) is a unit edit from head term 'quick'
    (20 occurrences, 1·10 ≤ 20 → flagged); 'quicks' is also distance 1
    but too frequent (5·10 > 20 → kept as a legitimate word); 'brown'
    has no unit-edit neighbors."""
    rows = [(i, "quick brown") for i in range(20)]
    rows += [(100 + i, "quicks brown") for i in range(5)]
    rows += [(200, "qwick")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["term"], r["variant"]): (r["term_count"], r["variant_count"])
        for r in spell_variants(docs, min_len=5).collect()
    }
    assert got == {("quick", "qwick"): (20, 1)}


def test_spell_variants_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = [(i, "quick brown quock") if i % 15 == 0 else (i, "quick brown")
            for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in spell_variants(docs, min_len=5).collect()
    )
    assert got  # the injected 'quock' must be found
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(spell_variants_sql(min_len=5)).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------- MMR
def _vec_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_mmr_first_pick_is_most_central_then_diversifies(spark):
    """Three 2-D vectors: v1,v2 nearly parallel near the x-axis, v3
    orthogonal. The centroid leans x-ward between v1 and v2, so rank 1
    = v2 (the closer of the pair); plain relevance would pick v1 next
    (cos to centroid 0.89 vs v3's 0.46), but at λ=0.5 the near-dup
    penalty (sim(1,2) ≈ 0.995 vs sim(3,2) ≈ 0.1) flips rank 2 to v3:
    0.5·0.886 − 0.5·0.995 < 0.5·0.463 − 0.5·0.0995."""
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.995, 0.1]),
        (3, [0.0, 1.0]),
    ]
    out = mmr_topk(_vec_df(spark, rows), k=3, pool=3, lam=0.5).collect()
    picks = [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert picks == [2, 3, 1]


def test_mmr_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = [
        (i, [float((i * 7 + d * 3) % 11) / 11.0 + 0.1 for d in range(4)])
        for i in range(1, 26)
    ]
    out = mmr_topk(_vec_df(spark, rows), k=6, pool=12, lam=0.7)
    got = sorted(tuple(r) for r in out.collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(mmr_topk_sql(k=6, pool=12, lam=0.7)).fetchall()
    )
    assert got == want
