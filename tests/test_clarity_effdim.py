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
