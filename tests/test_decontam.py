"""repeated_ngrams / contamination — brute-force and DuckDB-twin parity."""

import re

import duckdb
import pytest

from drone_spark.ops.decontam import (
    contamination,
    contamination_sql,
    repeated_ngrams,
    repeated_ngrams_sql,
)

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog today"),
    (2, "the quick brown fox jumps over another dog entirely now"),
    (3, "completely unrelated text about spark shuffles and joins"),
    (4, "the quick brown fox jumps over the lazy dog today"),  # dup of 1
    (5, ""),
    (6, "tiny doc"),  # shorter than n
    (7, "spark shuffles and joins are completely unrelated to foxes"),
]


def _norm_toks(t):
    t = re.sub(r"\s+", " ", t.strip().lower())
    return t.split(" ") if t else []


def _grams(t, n):
    toks = _norm_toks(t)
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _brute_repeated(docs, n, min_occ):
    corpus = {}
    for _, t in docs:
        for g in _grams(t, n):
            corpus[g] = corpus.get(g, 0) + 1
    out = {}
    for did, t in docs:
        gs = _grams(t, n)
        rep = sum(1 for g in gs if corpus[g] >= min_occ)
        out[did] = (len(gs), rep, (rep * 10000) // len(gs) if gs else 0)
    return out


def _brute_contam(docs, bench, n):
    bg = {g for _, t in bench for g in _grams(t, n)}
    out = {}
    for did, t in docs:
        gs = set(_grams(t, n))
        hit = len(gs & bg)
        out[did] = (len(gs), hit, (hit * 10000) // len(gs) if gs else 0)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_repeated_ngrams_matches_brute(spark, docs_df):
    got = {
        r.doc_id: (r.n_grams, r.n_repeated, r.rep_bp)
        for r in repeated_ngrams(docs_df, n=5, min_occ=2).collect()
    }
    assert got == _brute_repeated(DOCS, 5, 2)


def test_repeated_ngrams_dup_doc_fully_repeated(spark, docs_df):
    got = {r.doc_id: r.rep_bp for r in repeated_ngrams(docs_df, n=5).collect()}
    assert got[1] == 10000 and got[4] == 10000  # exact dup pair
    assert got[5] == 0 and got[6] == 0  # blank / too short


def test_contamination_matches_brute(spark, docs_df):
    bench = docs_df.where("doc_id IN (1, 3)")
    train = docs_df.where("doc_id NOT IN (1, 3)")
    got = {
        r.doc_id: (r.n_distinct, r.n_hit, r.contam_bp)
        for r in contamination(train, bench, n=5).collect()
    }
    want = _brute_contam(
        [d for d in DOCS if d[0] not in (1, 3)],
        [d for d in DOCS if d[0] in (1, 3)],
        5,
    )
    assert got == want
    assert got[4][2] == 10000  # dup of benchmark doc 1: fully contaminated


def test_sql_twins_match_spark(spark, docs_df):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    s = {
        tuple(r)
        for r in repeated_ngrams(docs_df, n=5, min_occ=2).collect()
    }
    d = {tuple(r) for r in con.execute(repeated_ngrams_sql("documents", 5, 2)).fetchall()}
    assert s == d
    bench_sel = "SELECT doc_id, text FROM documents WHERE doc_id IN (1, 3)"
    docs_sel = "SELECT doc_id, text FROM documents WHERE doc_id NOT IN (1, 3)"
    s2 = {
        tuple(r)
        for r in contamination(
            docs_df.where("doc_id NOT IN (1, 3)"),
            docs_df.where("doc_id IN (1, 3)"),
            n=5,
        ).collect()
    }
    d2 = {tuple(r) for r in con.execute(contamination_sql(docs_sel, bench_sel, 5)).fetchall()}
    assert s2 == d2
