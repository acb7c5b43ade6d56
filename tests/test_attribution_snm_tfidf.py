"""Round-5 continuation ops, batch 2: session attribution models,
sorted-neighborhood dedup, TF-IDF cosine pair join — hand oracles on
constructed inputs plus the blocking/band invariants."""

import datetime

import pytest
from pyspark.sql import functions as F

from drone_spark.ops.corpusstats import tfidf_cosine_topk
from drone_spark.ops.dedup import sorted_neighborhood_pairs
from drone_spark.ops.events import attribution


def _ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, 10, minute, second)


# ---------------------------------------------------------- attribution
def test_attribution_first_and_last_touch(spark):
    """User 1 session: view → click → purchase(10.00): first=view,
    last=click. User 2: purchase(5.50) opens its session → both models
    credit 'direct'. A >30 min gap splits user 1's second purchase
    into a new session where it is again first → direct/direct."""
    rows = [
        (1, 1, _ts(0), "view", 0.0),
        (2, 1, _ts(5), "click", 0.0),
        (3, 1, _ts(10), "purchase", 10.0),
        (4, 2, _ts(0), "purchase", 5.5),
        (5, 1, _ts(50), "purchase", 2.25),  # 40 min after last event
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )
    out = {
        (r["channel"], r["model"]): (r["conversions"], r["revenue_cents"])
        for r in attribution(ev).collect()
    }
    assert out[("view", "first_touch")] == (1, 1000)
    assert out[("click", "last_touch")] == (1, 1000)
    assert out[("direct", "first_touch")] == (2, 775)
    assert out[("direct", "last_touch")] == (2, 775)


def test_attribution_gap_keeps_session_together(spark):
    """Events 29 minutes apart stay in one session: the purchase's
    first touch is the opening view 58 minutes earlier."""
    rows = [
        (1, 1, _ts(0), "view", 0.0),
        (2, 1, _ts(29), "click", 0.0),
        (3, 1, _ts(58), "purchase", 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )
    out = {
        (r["channel"], r["model"]) for r in attribution(ev).collect()
    }
    assert ("view", "first_touch") in out and ("click", "last_touch") in out


# ------------------------------------------------- sorted neighborhood
def test_snm_finds_shared_prefix_dup(spark):
    """Two docs sharing a long prefix sort adjacently inside their
    block and verify above threshold; an unrelated doc never pairs."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, base + " iota"),
            (2, base + " kappa"),
            (3, "completely different words nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    out = {(r["a"], r["b"]): r["jaccard"]
           for r in sorted_neighborhood_pairs(docs, threshold=0.3).collect()}
    assert (1, 2) in out and out[(1, 2)] > 0.5
    assert all(3 not in pair for pair in out)


def test_snm_window_bounds_candidates(spark):
    """With window=1 inside one block, only rank-adjacent docs pair:
    identical docs 1/2/3 yield pairs (1,2),(2,3) but never (1,3)."""
    docs = spark.createDataFrame(
        [(i, "same exact text for every document") for i in (1, 2, 3)],
        "doc_id long, text string",
    )
    got = {(r["a"], r["b"])
           for r in sorted_neighborhood_pairs(docs, window=1).collect()}
    assert got == {(1, 2), (2, 3)}


# ----------------------------------------------------------- tf-idf cos
def test_tfidf_cosine_hand_oracle(spark):
    """Docs over a 3-term vocab; doc 3 is disjoint from doc 1.
    idf uses ln(N/df); pair (1,2) shares 'b' only."""
    import math

    docs = spark.createDataFrame(
        [
            (1, "a a b"),
            (2, "b b c"),
            (3, "c c c"),
        ],
        "doc_id long, text string",
    )
    # df: a=1, b=2, c=2; N=3 → idf_a=ln3, idf_b=idf_c=ln(1.5)
    ia, ib, ic = math.log(3), math.log(1.5), math.log(1.5)
    w1 = {"a": 2 * ia, "b": 1 * ib}
    w2 = {"b": 2 * ib, "c": 1 * ic}
    n1 = math.sqrt(sum(v * v for v in w1.values()))
    n2 = math.sqrt(sum(v * v for v in w2.values()))
    exp12 = round(w1["b"] * w2["b"] / (n1 * n2), 6)
    out = {(r["a"], r["b"]): r["cosine"]
           for r in tfidf_cosine_topk(docs, min_df=1, max_df_den=1).collect()}
    assert out[(1, 2)] == pytest.approx(exp12, abs=1e-6)
    assert (1, 3) not in out  # no shared in-band term → no dot row


def test_tfidf_df_band_drops_stopword(spark):
    """A token present in every doc has idf ln(1)=0 under
    max_df_den=1 — and is excluded entirely under max_df_den=2, so a
    pair sharing ONLY that token disappears."""
    docs = spark.createDataFrame(
        [(1, "the apple"), (2, "the banana"), (3, "the cherry")],
        "doc_id long, text string",
    )
    out = tfidf_cosine_topk(docs, min_df=1, max_df_den=2).collect()
    assert out == []
