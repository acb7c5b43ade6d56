"""Query clarity and participation-ratio effective dimensionality —
hand oracles + DuckDB twin replays (entry keys query_clarity /
effective_dim)."""

import math

import pytest

from drone_spark.ops.similarity import effective_dim, effective_dim_sql
from drone_spark.ops.textstats import query_clarity, query_clarity_sql


def test_clarity_hand(spark):
    """Query {a}, top-2 = docs 1 and 3 (doc 2 lacks 'a'). Top-docs
    model over {a:3, b:1, d:1} of 5; corpus {a:3, b:1, c:2, d:1} of 7;
    clarity = Σ p_q·log2(p_q/p_c) over the top vocabulary."""
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "c c"), (3, "a d")], "doc_id long, text string"
    )
    [row] = query_clarity(docs, ["a"], k_docs=2).collect()
    lam = 0.6
    want = 0.0
    for qf, cf in [(3, 3), (1, 1), (1, 1)]:
        p_q = lam * qf / 5 + (1 - lam) * cf / 7
        p_c = cf / 7
        want += p_q * math.log2(p_q / p_c)
    assert row["n_top_docs"] == 2
    assert row["vocab_q"] == 3
    assert row["clarity"] == pytest.approx(round(want, 6))


def test_clarity_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = [
        (i, " ".join(f"w{(i * 5 + j) % 13}" for j in range(3 + i % 4))
         + (" join hash" if i % 3 == 0 else ""))
        for i in range(1, 40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [tuple(r) for r in query_clarity(docs, ["join", "hash"]).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = [
        tuple(r)
        for r in con.execute(query_clarity_sql(["join", "hash"])).fetchall()
    ]
    assert got == want


def test_effective_dim_isotropic_and_collapsed(spark):
    """±unit vectors on two axes use both dims equally → ED = 2;
    vectors along one axis → ED = 1."""
    iso = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [-1.0, 0.0]), (4, [0.0, -1.0])],
        "vec_id long, embedding array<float>",
    )
    [r] = effective_dim(iso).collect()
    assert (r["n_vectors"], r["n_dims"]) == (4, 2)
    assert r["total_var"] == pytest.approx(1.0)
    assert r["effective_dim"] == pytest.approx(2.0)
    flat = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [2.0, 0.0]), (3, [3.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    [r] = effective_dim(flat).collect()
    assert r["effective_dim"] == pytest.approx(1.0)


def test_effective_dim_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = [
        (i, [float((i * 7 + d * 3) % 11) / 11.0 for d in range(6)])
        for i in range(1, 40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [tuple(r) for r in effective_dim(emb).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
    want = [tuple(r) for r in con.execute(effective_dim_sql()).fetchall()]
    assert got == want


# ---------------------------------------------------------------- bm25f
def test_bm25f_head_beats_body(spark):
    """Same single query-term hit: in the head (pos < head_len) it
    carries weight 3, in the body weight 1 — the head doc must
    outscore the body doc; exact scores recomputed by hand."""
    from drone_spark.ops.textstats import bm25f_topk

    docs = spark.createDataFrame(
        [(1, "q x x"), (2, "x x x x x x x x x x q")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["score"] for r in bm25f_topk(docs, ["q"]).collect()}
    idf = math.log(1 + 0.5 / 2.5)
    wdl1, wdl2 = 9, 31  # 3 head tokens ·3 ; 10 head ·3 + 1 body
    avgdl = 20.0
    k1, b = 1.2, 0.75

    def score(wtf, wdl):
        return round(
            idf * wtf * (k1 + 1) / (wtf + k1 * (1 - b + b * wdl / avgdl)), 6
        )

    assert got[1] == pytest.approx(score(3, wdl1))
    assert got[2] == pytest.approx(score(1, wdl2))
    assert got[1] > got[2]


def test_bm25f_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    from drone_spark.ops.textstats import bm25f_topk, bm25f_topk_sql

    rows = [
        (i, " ".join(f"w{(i * 5 + j) % 13}" for j in range(3 + i % 9))
         + (" join" if i % 3 == 0 else "") + (" hash" if i % 4 == 0 else ""))
        for i in range(1, 40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in bm25f_topk(docs, ["join", "hash"], k=15).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(bm25f_topk_sql(["join", "hash"], k=15)).fetchall()
    )
    assert got == want


# ----------------------------------------------------- truss modularity
def test_truss_modularity_two_k4(spark, engine):
    """Two K4s + bridge + pendant at k=4: communities {1..4}, {5..8},
    singleton {9}; m=14. q_num checks: c1 = 4·14·6 − 13² = 167,
    c5 = 336 − 14² = 140, c9 = 0 − 1² = −1."""
    from drone_spark.algorithms.linkstats import modularity
    from drone_spark.algorithms.trusses import truss_communities
    from pyspark.sql import functions as F

    rows = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (5, 6), (5, 7), (5, 8), (6, 7), (6, 8), (7, 8),
        (4, 5), (8, 9),
    ]
    e = spark.createDataFrame(rows, "src long, dst long")
    tc = truss_communities(spark, engine, e, k=4, run_id="t_tm")
    allv = (
        e.select(F.col("src").alias("vid"))
        .union(e.select(F.col("dst").alias("vid")))
        .distinct()
    )
    asg = allv.join(tc, "vid", "left").select(
        "vid", F.coalesce("community", F.col("vid")).alias("community")
    )
    got = {
        r["community"]: (r["internal_edges"], r["degree_sum"], r["q_num"])
        for r in modularity(e, asg).collect()
    }
    assert got == {
        1: (6, 13, 167),
        5: (6, 14, 140),
        9: (0, 1, -1),
    }


# ------------------------------------------------------ lang mismatch
def test_lang_mismatch_hand(spark):
    """Doc 1 declares 'de' but is marker-English → one (de, en) row;
    doc 2 agrees with its label; doc 3 has no markers → (fr, und)."""
    from drone_spark.ops.textstats import lang_mismatch

    docs = spark.createDataFrame(
        [
            (1, "the quick fox and the dog", "de"),
            (2, "the cat and the hat", "en"),
            (3, "zzz qqq", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        (r["lang"], r["lang_pred"]): (r["n_docs"], r["sample_doc_id"])
        for r in lang_mismatch(docs).collect()
    }
    assert got[("de", "en")] == (1, 1)
    assert got[("fr", "und")] == (1, 3)
    assert ("en", "en") not in got and len(got) == 2


def test_lang_mismatch_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    from drone_spark.ops.textstats import lang_mismatch, lang_mismatch_sql

    rows = [
        (i, ["the and of fox", "der und die das", "le la et renard",
             "el la y zorro", "qqq zzz"][i % 5], ["en", "de", "fr", "es", "zh"][i % 3])
        for i in range(1, 40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = sorted(tuple(r) for r in lang_mismatch(docs).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r) for r in con.execute(lang_mismatch_sql()).fetchall()
    )
    assert got == want
