"""Round-5 continuation ops, batch 13: bigram continuation table and
within-session basket lift — hand oracles."""

import datetime

from drone_spark.ops.corpusstats import next_token_top3
from drone_spark.ops.events import basket_lift


def test_next_token_distribution(spark):
    """Context 'go': continuations home×6, away×4, back×2 (12 total)
    → ranks home/away/back with p_ppm 500000/333333/166666."""
    text = " ".join(
        ["go home"] * 6 + ["go away"] * 4 + ["go back"] * 2
    )
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = {(r["t1"], r["rank"]): (r["t2"], r["n12"], r["p_ppm"])
           for r in next_token_top3(docs, min_ctx=10).collect()}
    assert out[("go", 1)] == ("home", 6, 500_000)
    assert out[("go", 2)] == ("away", 4, 333_333)
    assert out[("go", 3)] == ("back", 2, 166_666)
    # 'home' as context has fewer than min_ctx bigrams → absent
    assert not any(t1 == "home" for (t1, _r) in out)


def test_basket_lift_perfect_cooccurrence(spark):
    """10 sessions each containing {a,b}; 10 sessions containing only
    {c}. n_a=n_b=n_ab=10, S=20 → lift = 1e6·10·20/100 = 2e6 (a and b
    co-occur 2× more than independence predicts at these margins)."""
    rows, eid = [], 0
    t0 = datetime.datetime(2024, 1, 1)
    for s in range(10):
        base = t0 + datetime.timedelta(days=s)
        rows.append((eid, 1, base, "a", 0.0)); eid += 1
        rows.append((eid, 1, base + datetime.timedelta(minutes=5), "b", 0.0)); eid += 1
        rows.append((eid, 2, base, "c", 0.0)); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )
    out = {(r["a"], r["b"]): (r["n_ab"], r["lift_ppm"])
           for r in basket_lift(ev, min_pair=5).collect()}
    assert out == {("a", "b"): (10, 2_000_000)}


def test_basket_lift_min_pair_gate(spark):
    rows = [
        (0, 1, datetime.datetime(2024, 1, 1), "a", 0.0),
        (1, 1, datetime.datetime(2024, 1, 1, 0, 5), "b", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )
    assert basket_lift(ev, min_pair=5).collect() == []
