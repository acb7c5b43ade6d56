"""Round-5 continuation ops, batch 15: readability panel, RFM
quintile segmentation, event-type Markov stationary distribution —
hand oracles."""

import datetime

from drone_spark.ops.events import markov_stationary, rfm_segments
from drone_spark.ops.textstats import readability


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )


def test_readability_hand_case(spark):
    """'The cat sat. It ran fast!' — 6 words, 2 sentences, syllable
    groups: e/a/a/i/a/a = 6 vowel runs; all words < 7 chars."""
    out = readability(_docs(spark, [(1, "The cat sat. It ran fast!")])).collect()[0]
    assert out["n_words"] == 6
    assert out["n_sent"] == 2
    assert out["n_syll"] == 6
    # letters: TheCatSat.ItRanFast! = 9+1 + 2+3+5+1 ... count without
    # whitespace: "The"+"cat"+"sat."+"It"+"ran"+"fast!" = 3+3+4+2+3+5 = 20
    assert out["avg_wlen_milli"] == 1000 * 20 // 6
    assert out["long_pct"] == 0
    assert out["syll_per_word_micro"] == 1_000_000 * 6 // 6
    assert out["flesch_milli"] == 206_835 - (1015 * 6) // 2 - (84600 * 6) // 6


def test_readability_no_punctuation_floors_sentences(spark):
    """Corpus-style text with no [.!?] → n_sent floors at 1;
    'wonderful' (9 chars) is the one long word of 3."""
    out = readability(_docs(spark, [(1, "a wonderful xyz")])).collect()[0]
    assert out["n_sent"] == 1
    assert out["n_words"] == 3
    assert out["long_pct"] == 100 * 1 // 3
    # vowel runs: a | o,e,u | (xyz: y counts) → a=1, wonderful= o,e,u =3,
    # xyz has y → 1; total 5
    assert out["n_syll"] == 5


def test_rfm_quintiles_order_and_bands(spark):
    """10 users: user i has i+1 events (freq ladder), value 10·(i+1),
    last event at day i. Highest-frequency users must read f=5, most
    recent r=5, biggest spenders m=5 — all three ladders coincide."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(10):
        for j in range(u + 1):
            rows.append(
                (eid, u, t0 + datetime.timedelta(days=u, minutes=j),
                 "buy", 10.0 * (u + 1))
            )
            eid += 1
    out = {r["user_id"]: r for r in rfm_segments(_ev(spark, rows)).collect()}
    assert out[9]["r"] == 5 and out[9]["f"] == 5 and out[9]["m"] == 5
    assert out[0]["r"] == 1 and out[0]["f"] == 1 and out[0]["m"] == 1
    assert out[9]["rfm"] == 555 and out[0]["rfm"] == 111
    # 10 users / 5 bands → exactly 2 per band on every dimension
    for dim in ("r", "f", "m"):
        per = {}
        for r in out.values():
            per[r[dim]] = per.get(r[dim], 0) + 1
        assert per == {1: 2, 2: 2, 3: 2, 4: 2, 5: 2}
    assert out[9]["recency_days"] == 0
    assert out[0]["recency_days"] == 9
    assert out[9]["frequency"] == 10
    assert out[9]["monetary_cents"] == 10 * 10000


def test_markov_stationary_two_state_chain(spark):
    """Deterministic alternating chain a→b→a→… has stationary
    (1/2, 1/2); integer ppm renormalization keeps both at 500000."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(40):
        rows.append(
            (i, 1, t0 + datetime.timedelta(minutes=i),
             "a" if i % 2 == 0 else "b", 0.0)
        )
    out = {r["event_type"]: r["stationary_ppm"]
           for r in markov_stationary(_ev(spark, rows), iters=6).collect()}
    assert out == {"a": 500_000, "b": 500_000}


def test_markov_stationary_biased_chain(spark):
    """Period-4 cycle a,a,a,b: P(a→a)=2/3, P(a→b)=1/3, P(b→a)=1 →
    stationary (3/4, 1/4) up to ppm flooring (the occupancy share of
    each state in the cycle)."""
    t0 = datetime.datetime(2024, 1, 1)
    # sequence: a a a a b a a a b ... period 4 from a: a,a,a,b
    seq = (["a", "a", "a", "b"] * 30)
    rows = [
        (i, 1, t0 + datetime.timedelta(minutes=i), s, 0.0)
        for i, s in enumerate(seq)
    ]
    out = {r["event_type"]: r["stationary_ppm"]
           for r in markov_stationary(_ev(spark, rows), iters=20).collect()}
    assert abs(out["a"] - 750_000) < 2_000
    assert abs(out["b"] - 250_000) < 2_000
