"""Round-5 continuation ops, batch 10: char entropy, in/out degree
correlation, conversion lag — hand oracles."""

import datetime
import math

import pytest

from drone_spark.algorithms.linkstats import inout_correlation
from drone_spark.ops.events import conversion_lag
from drone_spark.ops.textstats import char_entropy


def test_char_entropy_extremes(spark):
    """'aaaa' → 0; 'ab' → ln2 in floored micro-nats; '' → 0 row."""
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: (r["n_chars"], r["entropy_micro"])
           for r in char_entropy(docs).collect()}
    assert out[1] == (4, 0)
    ln2 = math.floor(1_000_000 * math.log(2))
    assert out[2] == (2, ln2)
    assert out[3] == (0, 0)


def test_char_entropy_weighted_mean(spark):
    """'aab': n=3, n_a=2, n_b=1 →
    (2·⌊1e6·ln(3/2)⌋ + 1·⌊1e6·ln 3⌋) div 3."""
    docs = spark.createDataFrame([(1, "aab")], "doc_id long, text string")
    exp = (2 * math.floor(1e6 * math.log(3 / 2))
           + math.floor(1e6 * math.log(3))) // 3
    assert char_entropy(docs).collect()[0]["entropy_micro"] == exp


def test_inout_correlation_sign(spark):
    """Cycle 1→2→3→1: every vertex (1,1) → zero variance, r NaN/None?
    Use a graph with spread: star-out from 1 plus star-in to 1:
    vertex 1 = (out 2, in 2), leaves (out ≤1, in ≤1) — positive r."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 1), (5, 1), (2, 4)], "src long, dst long"
    )
    r = inout_correlation(edges).collect()[0]
    assert r["n_vertices"] == 5
    # vertex degrees x,y: 1:(2,2) 2:(1,1) 3:(0,1) 4:(1,1) 5:(1,0)
    n, sx, sy = 5, 5, 5
    sxx = 4 + 1 + 0 + 1 + 1
    syy = 4 + 1 + 1 + 1 + 0
    sxy = 4 + 1 + 0 + 1 + 0
    exp = round((n * sxy - sx * sy)
                / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
    assert r["r"] == pytest.approx(exp, abs=1e-6)


def test_conversion_lag_histogram(spark):
    """User 1 signs up at t0, purchases 90 min later → bucket 1;
    user 2 purchases BEFORE signup only → excluded; user 3 converts
    in 10 min → bucket 0."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (0, 1, t0, "signup", 0.0),
        (1, 1, t0 + datetime.timedelta(minutes=90), "purchase", 1.0),
        (2, 2, t0, "purchase", 1.0),
        (3, 2, t0 + datetime.timedelta(hours=1), "signup", 0.0),
        (4, 3, t0, "signup", 0.0),
        (5, 3, t0 + datetime.timedelta(minutes=10), "purchase", 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )
    out = {r["lag_hours"]: r["n_users"] for r in conversion_lag(ev).collect()}
    assert out == {0: 1, 1: 1}
