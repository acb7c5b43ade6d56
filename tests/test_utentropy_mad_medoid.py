"""Round-5 continuation ops, batch 14: user type entropy, median/MAD
value outliers, label medoids — hand oracles."""

import datetime
import math

import pytest

from drone_spark.ops.events import user_type_entropy, value_outliers
from drone_spark.ops.similarity import label_medoids


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )


def test_user_type_entropy_extremes(spark):
    """User 1: 20 events of one type → 0. User 2: 10+10 of two types
    → floored 1e6·ln2."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(i, 1, t0, "a", 0.0) for i in range(20)]
    rows += [(100 + i, 2, t0, "a" if i < 10 else "b", 0.0)
             for i in range(20)]
    out = {r["user_id"]: r["entropy_micro"]
           for r in user_type_entropy(_ev(spark, rows), min_events=20).collect()}
    assert out[1] == 0
    assert out[2] == math.floor(1_000_000 * math.log(2))


def test_user_type_entropy_min_events_gate(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(i, 1, t0, "a", 0.0) for i in range(5)]
    assert user_type_entropy(_ev(spark, rows), min_events=20).collect() == []


def test_value_outliers_median_mad(spark):
    """Values 1..9 plus 100: median of 10 values at rank 5 = 5.00
    (500c); deviations |x−500|: 400,300,...,400,9500 → sorted ranks
    give MAD at rank 5; the 100.00 event is the only one beyond
    5×MAD."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(i, 1, t0, "buy", float(i + 1)) for i in range(9)]
    rows.append((9, 1, t0, "buy", 100.0))
    out = value_outliers(_ev(spark, rows), k_times_10=50).collect()
    assert len(out) == 1
    r = out[0]
    assert r["cents"] == 10000 and r["median_c"] == 500
    # deviations sorted: 100,100,200,200,300,300,400,400,0? recompute:
    # |x-500| for 100..900 = 400,300,200,100,0,100,200,300,400; plus 9500
    # sorted: 0,100,100,200,200,300,300,400,400,9500 → rank5 = 200
    assert r["mad_c"] == 200


def test_label_medoids_picks_nearest_to_centroid(spark):
    """Label x has vectors at angles 0° and 90°; centroid at 45° —
    both are cos(45°); tie broken by vec_id → vec 1. Adding a 45°
    vector makes it the clear medoid."""
    rows = [
        (1, [1.0, 0.0], "x"),
        (2, [0.0, 1.0], "x"),
        (3, [1.0, 1.0], "x"),
        (4, [0.0, 1.0], "y"),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    out = {r["label"]: (r["vec_id"], r["cos"])
           for r in label_medoids(emb).collect()}
    assert out["x"][0] == 3
    assert out["x"][1] == pytest.approx(1.0, abs=1e-6)
    assert out["y"][0] == 4
