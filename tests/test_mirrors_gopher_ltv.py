"""Hand oracles for neighbor_jaccard (mirror hosts), gopher_rules,
and cohort_ltv."""

import datetime

from drone_spark.algorithms.linkstats import neighbor_jaccard
from drone_spark.ops.events import cohort_ltv
from drone_spark.ops.textstats import gopher_rules


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_neighbor_jaccard_exact(spark):
    """a→{x,y,z}, b→{x,y}, c→{q}: J(a,b)=2/3=666666 ppm, no other
    pair shares ≥2 targets."""
    e = _edges(
        spark,
        [("a", "x"), ("a", "y"), ("a", "z"), ("b", "x"), ("b", "y"), ("c", "q")],
    )
    out = neighbor_jaccard(e, min_jaccard_ppm=0, min_inter=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["src_a"], r["src_b"]) == ("a", "b")
    assert (r["inter"], r["union_sz"], r["jaccard_ppm"]) == (2, 3, 666666)


def test_neighbor_jaccard_cap_drops_popular_target(spark):
    """Target 'hub' is linked by everyone; with max_in_degree=2 it is
    removed from the universe, so a/b intersect only on {x} →
    below min_inter=2 → no pair."""
    e = _edges(
        spark,
        [
            ("a", "hub"), ("b", "hub"), ("c", "hub"),
            ("a", "x"), ("b", "x"),
        ],
    )
    assert neighbor_jaccard(e, min_jaccard_ppm=0, max_in_degree=2).count() == 0
    # and with the cap relaxed the pair comes back with J=1
    out = neighbor_jaccard(e, min_jaccard_ppm=0, max_in_degree=3).collect()
    assert len(out) == 1 and out[0]["jaccard_ppm"] == 1_000_000


def test_neighbor_jaccard_dedupes_multi_edges(spark):
    e = _edges(spark, [("a", "x"), ("a", "x"), ("b", "x"), ("a", "y"), ("b", "y")])
    (r,) = neighbor_jaccard(e, min_jaccard_ppm=0).collect()
    assert (r["inter"], r["union_sz"]) == (2, 2)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_rules_flags(spark):
    """Doc 1: 50 short stopword-bearing words → passes everything.
    Doc 2: 5 words → fails r_wordcount. Doc 3: long words → fails
    r_meanlen. Doc 4: no stopwords → fails r_stopwords."""
    good = ("that have " + "cat dog " * 24).strip()  # 50 words, Σlen 152 ≥ 3·50
    docs = _docs(
        spark,
        [
            (1, good),
            (2, "the be cat dog cat"),
            (3, " ".join(["pneumonoultramicro"] * 60) + " the be"),
            (4, "cat dog " * 30),
        ],
    )
    out = {r["doc_id"]: r for r in gopher_rules(docs, min_words=50).collect()}
    assert out[1]["passed"]
    assert not out[2]["r_wordcount"] and not out[2]["passed"]
    assert out[3]["r_wordcount"] and not out[3]["r_meanlen"]
    assert not out[4]["r_stopwords"] and not out[4]["passed"]


def test_gopher_meanlen_band_is_inclusive(spark):
    """Exactly mean length 3 and exactly 10 both pass (3n ≤ Σ ≤ 10n)."""
    doc3 = " ".join(["abc"] * 50)
    doc10 = " ".join(["abcdefghij"] * 50)
    docs = _docs(spark, [(1, doc3), (2, doc10)])
    out = {r["doc_id"]: r["r_meanlen"] for r in gopher_rules(docs).collect()}
    assert out == {1: True, 2: True}


def _ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )


def test_cohort_ltv_hand_case(spark):
    """User 1 first seen week w (click), buys 10.50 same week and
    3.25 next week; user 2 first seen next week, buys 1.00 then."""
    d = datetime.datetime
    base = d(2024, 1, 4)  # within one epoch week
    nxt = base + datetime.timedelta(days=7)
    ev = _ev(
        spark,
        [
            (1, 1, base, "click", 0.0),
            (2, 1, base + datetime.timedelta(hours=1), "purchase", 10.50),
            (3, 1, nxt, "purchase", 3.25),
            (4, 2, nxt, "purchase", 1.00),
        ],
    )
    out = {
        (r["cohort_week"] - 2817, r["week_offset"]): (
            r["n_purchases"],
            r["n_buyers"],
            r["revenue_c"],
        )
        for r in cohort_ltv(ev).collect()
    }
    # base epoch week = floor(epoch/604800); relative weeks 0 and 1
    w0 = min(k[0] for k in out)
    rel = {(k[0] - w0, k[1]): v for k, v in out.items()}
    assert rel[(0, 0)] == (1, 1, 1050)
    assert rel[(0, 1)] == (1, 1, 325)
    assert rel[(1, 0)] == (1, 1, 100)
    assert len(rel) == 3
