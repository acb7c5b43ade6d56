"""Round-5 continuation ops, batch 7: bigram surprisal, encoding
flags, dwell times, label separation — hand oracles."""

import datetime
import math

import pytest

from drone_spark.ops.corpusstats import bigram_surprisal
from drone_spark.ops.events import dwell_times
from drone_spark.ops.similarity import label_separation
from drone_spark.ops.textstats import encoding_flags


# ----------------------------------------------------- bigram surprisal
def test_bigram_surprisal_hand_oracle(spark):
    """Corpus 'a b' ×3 + 'a c': bigrams (a,b)×3, (a,c)×1. c1(a)=4,
    V=1. s(a,b)=floor(1e6·ln(5/4)); s(a,c)=floor(1e6·ln(5/2))."""
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["n_bigrams"], r["mean_surprisal_micro"])
           for r in bigram_surprisal(docs).collect()}
    s_ab = math.floor(1_000_000 * math.log(5 / 4))
    s_ac = math.floor(1_000_000 * math.log(5 / 2))
    assert out[1] == (1, s_ab)
    assert out[4] == (1, s_ac)
    # the rare continuation is more surprising
    assert s_ac > s_ab


def test_bigram_surprisal_word_salad_reads_high(spark):
    """Same unigram bag, scrambled order: the shuffled doc's bigrams
    are rarer, so its mean bigram surprisal exceeds the canonical
    doc's."""
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps") for i in range(9)]
        + [(9, "fox the jumps quick brown")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["mean_surprisal_micro"]
           for r in bigram_surprisal(docs).collect()}
    assert out[9] > out[0]


# ------------------------------------------------------- encoding flags
def test_encoding_flags_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "plain ascii"),
            (2, "café über"),          # 2 non-ascii
            (3, "bad\x01byte�here"),        # 1 control, 1 replacement
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in encoding_flags(docs).collect()}
    assert out[1]["non_ascii"] == 0 and out[1]["ascii_ppm"] == 1_000_000
    assert out[2]["non_ascii"] == 2
    assert out[3]["control"] == 1 and out[3]["replacement"] == 1
    # the replacement char is also non-ascii
    assert out[3]["non_ascii"] == 1
    assert out[4]["n_chars"] == 0 and out[4]["ascii_ppm"] == 1_000_000


def test_encoding_flags_keeps_tab_newline(spark):
    docs = spark.createDataFrame(
        [(1, "a\tb\nc\rd")], "doc_id long, text string"
    )
    assert encoding_flags(docs).collect()[0]["control"] == 0


# ---------------------------------------------------------- dwell times
def test_dwell_times_exact_percentiles(spark):
    """One user, one session, views dwelling 10,20,...,100 s before the
    next event (11 events total). n=10 view dwells: p50 = 5th = 50,
    p90 = 9th = 90, mean = 55."""
    rows, eid, t = [], 0, datetime.datetime(2024, 1, 1)
    for d in range(10, 101, 10):
        rows.append((eid, 1, t, "view", 0.0)); eid += 1
        t += datetime.timedelta(seconds=d)
    rows.append((eid, 1, t, "purchase", 1.0))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )
    out = {r["event_type"]: r for r in dwell_times(ev).collect()}
    v = out["view"]
    assert (v["n"], v["mean_dwell_s"], v["p50_s"], v["p90_s"]) == (10, 55, 50, 90)
    assert "purchase" not in out  # session-last event has no dwell


def test_dwell_times_session_boundary_cuts_dwell(spark):
    """A 40-minute gap ends the session: the event before it gets no
    dwell row."""
    rows = [
        (0, 1, datetime.datetime(2024, 1, 1, 10, 0), "view", 0.0),
        (1, 1, datetime.datetime(2024, 1, 1, 10, 40), "view", 0.0),
        (2, 1, datetime.datetime(2024, 1, 1, 10, 41), "click", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )
    out = {r["event_type"]: r["n"] for r in dwell_times(ev).collect()}
    assert out == {"view": 1}  # only the 10:40 view dwells (60 s)


# ------------------------------------------------------ label separation
def test_label_separation_orthogonal_vs_aligned(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], "x"),
            (2, [1.0, 0.0], "x"),
            (3, [0.0, 1.0], "y"),
            (4, [0.0, 1.0], "y"),
            (5, [1.0, 0.0], "z"),
        ],
        "vec_id long, embedding array<double>, label string",
    )
    out = {(r["label_a"], r["label_b"]): r["centroid_cosine"]
           for r in label_separation(emb).collect()}
    assert out[("x", "y")] == pytest.approx(0.0, abs=1e-9)
    assert out[("x", "z")] == pytest.approx(1.0, abs=1e-9)
    assert out[("y", "z")] == pytest.approx(0.0, abs=1e-9)
