"""Hand oracles for hitting_time_fixed and cusum_changepoints."""

import datetime

from drone_spark.algorithms.sssp import hitting_time_fixed
from drone_spark.ops.events import cusum_changepoints

from pyspark.sql import functions as F


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, w long")


def test_hitting_time_chain(spark):
    """c → b → a (target): h(a)=0, h(b)=1 step, h(c)=2 steps exactly
    (deterministic walk, probabilities all 1e6 ppm)."""
    e = _edges(spark, [("b", "a", 1), ("c", "b", 1)])
    out = {r["vid"]: r["h_milli"]
           for r in hitting_time_fixed(e, F.lit("a"), iters=6).collect()}
    assert out == {"a": 0, "b": 1000, "c": 2000}


def test_hitting_time_split_probability(spark):
    """b → a with p=3/4 (w=3) and b → c with p=1/4 (w=1); c → a.
    h(b) = 1 + 1/4·(1 + h(a)... ) — exact recursion at horizon:
    h(c)=1000, h(b)=1 + 0.25·h(c) = 1250 milli once h(c) converges."""
    e = _edges(spark, [("b", "a", 3), ("b", "c", 1), ("c", "a", 1)])
    out = {r["vid"]: r["h_milli"]
           for r in hitting_time_fixed(e, F.lit("a"), iters=6).collect()}
    assert out["a"] == 0
    assert out["c"] == 1000
    assert out["b"] == 1250


def test_hitting_time_unreachable_drifts_to_horizon(spark):
    """z only links away from the target's component → h grows by
    1000 per round (never absorbs within the horizon)."""
    e = _edges(spark, [("b", "a", 1), ("z", "y", 1), ("y", "z", 1)])
    out = {r["vid"]: r["h_milli"]
           for r in hitting_time_fixed(e, F.lit("a"), iters=4).collect()}
    assert out["z"] == 4000 and out["y"] == 4000


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )


def test_cusum_step_change(spark):
    """Daily counts 1,1,1,3,3 (D=5, T=9): dev = 5·n−9 → -4,-4,-4,6,6;
    R = -4,-8,-12,-6,0; min-prefix = -4,-8,-12,-12,-12;
    S = R − min(0, minR) = 0,0,0,6,12 — the step-up surfaces on day 4."""
    t0 = datetime.datetime(2024, 3, 1)
    rows, eid = [], 0
    for day, n in enumerate([1, 1, 1, 3, 3]):
        for i in range(n):
            rows.append((eid, 1, t0 + datetime.timedelta(days=day, minutes=i),
                         "click", 0.0))
            eid += 1
    out = {r["day"]: r["cusum_scaled"]
           for r in cusum_changepoints(_ev(spark, rows)).collect()}
    assert out == {"2024-03-01": 0, "2024-03-02": 0, "2024-03-03": 0,
                   "2024-03-04": 6, "2024-03-05": 12}


def test_cusum_flat_series_is_zero(spark):
    t0 = datetime.datetime(2024, 3, 1)
    rows = [(d, 1, t0 + datetime.timedelta(days=d), "view", 0.0)
            for d in range(4)]
    out = cusum_changepoints(_ev(spark, rows)).collect()
    assert all(r["cusum_scaled"] == 0 for r in out)
