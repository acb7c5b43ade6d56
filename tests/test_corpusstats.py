"""Corpus-law and index-compression ops (ops/corpusstats.py,
linkstats.degree_gini) against hand-computed references, plus the
pure-JVM plan pins (no Python eval on any hot path)."""

import math

import pytest
from pyspark.sql import functions as F

from drone_spark.algorithms.linkstats import degree_gini
from drone_spark.ops.corpusstats import (
    heaps_law, pmi_pairs, posting_gaps, zipf_slope,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# zipf_slope
# ---------------------------------------------------------------------------
def test_zipf_slope_matches_numpy_fit(spark):
    # freqs 4, 2, 1 for tokens a, b, c → ranks 1, 2, 3
    docs = _docs(spark, [(0, "a a b"), (1, "a a b c")])
    row = zipf_slope(docs, k=10).collect()[0]
    xs = [math.log(r) for r in (1, 2, 3)]
    ys = [math.log(n) for n in (4, 2, 1)]
    mx, my = sum(xs) / 3, sum(ys) / 3
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    sxx = sum((x - mx) ** 2 for x in xs)
    syy = sum((y - my) ** 2 for y in ys)
    assert row["n_terms"] == 3
    assert row["slope"] == pytest.approx(sxy / sxx, abs=2e-6)
    assert row["intercept"] == pytest.approx(my - sxy / sxx * mx, abs=2e-6)
    assert row["r2"] == pytest.approx(sxy * sxy / (sxx * syy), abs=2e-6)


def test_zipf_slope_negative_on_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    row = zipf_slope(docs, k=1000).collect()[0]
    assert row["slope"] < 0
    assert 0.0 < row["r2"] <= 1.0


# ---------------------------------------------------------------------------
# heaps_law
# ---------------------------------------------------------------------------
def test_heaps_law_matches_python_cumulation(spark):
    texts = {
        0: "a b c",
        1: "a b",
        2: "d",
        3: "",
        4: "a d e e",
        5: "f",
    }
    docs = _docs(spark, sorted(texts.items()))
    got = {
        r["doc_id"]: (r["cum_tokens"], r["cum_vocab"])
        for r in heaps_law(docs, stride=1, n_buckets=3).collect()
    }
    seen, toks = set(), 0
    want = {}
    for did in sorted(texts):
        ws = texts[did].split()
        toks += len(ws)
        seen.update(ws)
        want[did] = (toks, len(seen))
    assert got == want


def test_heaps_law_two_level_equals_naive_window(spark):
    """The distributed two-level scan must equal a naive global cumsum
    (bucket count chosen so buckets are non-trivial)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {
        r["doc_id"]: (r["cum_tokens"], r["cum_vocab"])
        for r in heaps_law(docs, stride=7, n_buckets=16).collect()
    }
    b = {
        r["doc_id"]: (r["cum_tokens"], r["cum_vocab"])
        for r in heaps_law(docs, stride=7, n_buckets=1).collect()
    }
    assert a == b and len(a) > 10


# ---------------------------------------------------------------------------
# posting_gaps
# ---------------------------------------------------------------------------
def test_posting_gaps_varint_boundaries(spark):
    # token x in docs 0, 100, 16483: gaps 100 (<128 → 1B), 16383 (<16384 → 2B)
    docs = _docs(spark, [(0, "x"), (100, "x y"), (16483, "x")])
    rows = {r["token"]: r for r in posting_gaps(docs, min_df=1).collect()}
    x = rows["x"]
    assert (x["df"], x["sum_gap"], x["max_gap"], x["varint_bytes"]) == (
        3, 16483, 16383, 3,
    )
    y = rows["y"]
    assert (y["df"], y["sum_gap"], y["varint_bytes"]) == (1, None, 0)


def test_posting_gaps_min_df_filters(spark):
    docs = _docs(spark, [(0, "x y"), (1, "x"), (2, "x")])
    toks = {r["token"] for r in posting_gaps(docs, min_df=3).collect()}
    assert toks == {"x"}


# ---------------------------------------------------------------------------
# pmi_pairs
# ---------------------------------------------------------------------------
def test_pmi_exact_value_and_ordering(spark):
    # a,b always together (4 docs of 8); c independent of them.
    rows = [
        (0, "a b c"), (1, "a b"), (2, "a b c"), (3, "a b"),
        (4, "c d"), (5, "d e"), (6, "c d"), (7, "d e"),
    ]
    docs = _docs(spark, rows)
    got = {
        (r["t1"], r["t2"]): r
        for r in pmi_pairs(
            docs, min_df=2, max_df_den=1, per_doc_cap=8, min_pair=2, k=50
        ).collect()
    }
    ab = got[("a", "b")]
    # pmi(a,b) = ln(8·4 / (4·4)) = ln 2
    assert ab["n12"] == 4 and ab["pmi"] == pytest.approx(math.log(2), abs=2e-6)
    # pmi(a,c) = ln(8·2 / (4·4)) = 0
    assert got[("a", "c")]["pmi"] == pytest.approx(0.0, abs=2e-6)
    # associated pair must outrank the independent one
    assert ab["pmi"] > got[("c", "d")]["pmi"] or ("c", "d") not in got


def test_pmi_per_doc_cap_bounds_pairs(spark):
    # 12 eligible tokens per doc, cap 3 → every doc yields C(3,2)=3 pairs
    text = " ".join(f"t{i:02d}" for i in range(12))
    docs = _docs(spark, [(i, text) for i in range(6)])
    out = pmi_pairs(
        docs, min_df=1, max_df_den=1, per_doc_cap=3, min_pair=1, k=100
    ).collect()
    # only the 3 lexicographically-first tokens survive the cap
    toks = {t for r in out for t in (r["t1"], r["t2"])}
    assert toks == {"t00", "t01", "t02"} and len(out) == 3


# ---------------------------------------------------------------------------
# degree_gini
# ---------------------------------------------------------------------------
def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_gini_zero_when_uniform(spark):
    # ring: every vertex out-degree exactly 1
    e = _edges(spark, [(i, (i + 1) % 5) for i in range(5)])
    row = degree_gini(e).collect()[0]
    assert row["n_vertices"] == 5 and row["total_degree"] == 5
    assert row["gini"] == pytest.approx(0.0, abs=1e-9)


def test_gini_matches_sorted_rank_formula(spark):
    # star + isolates-by-sink: hub 0 → 1..6; sinks have out-degree 0
    e = _edges(spark, [(0, i) for i in range(1, 7)])
    row = degree_gini(e).collect()[0]
    degs = sorted([6] + [0] * 6)
    n, tot = len(degs), sum(degs)
    g = 2 * sum(i * d for i, d in enumerate(degs, 1)) / (n * tot) - (n + 1) / n
    assert row["gini"] == pytest.approx(g, abs=2e-6)
    assert row["n_vertices"] == 7 and row["total_degree"] == 6


# ---------------------------------------------------------------------------
# plan pins: everything stays JVM-side
# ---------------------------------------------------------------------------
def test_corpusstats_no_python_eval(spark):
    docs = _docs(spark, [(0, "a b"), (1, "b c")])
    e = _edges(spark, [(0, 1), (1, 2)])
    for df in (
        zipf_slope(docs, k=10),
        heaps_law(docs, stride=1, n_buckets=2),
        posting_gaps(docs, min_df=1),
        pmi_pairs(docs, min_df=1, max_df_den=1, min_pair=1),
        degree_gini(e),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEvalPython",
                       "FlatMapGroupsInPandas", "MapInPandas"):
            assert marker not in plan
