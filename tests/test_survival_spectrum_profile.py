"""Kaplan–Meier survival, clustering spectrum, table profiling."""

import datetime

from pyspark.sql import functions as F

from drone_spark.algorithms.linkstats import clustering_spectrum
from drone_spark.ops.events import km_survival


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


def test_km_survival_hand_oracle(spark):
    """3 users sign up on day 1. u1 converts day 2 (t=1), u2 converts
    day 4 (t=3), u3 never (censored at window end day 6, t=5).
    Events at t=1: n=3, d=1 → S = 1e6·2/3 = 666666.
    At t=3: n=2, d=1 → S = 666666·1/2 = 333333."""
    rows = [
        (1, _ts(1), 1, "signup", 0.0, ""),
        (2, _ts(2), 1, "purchase", 1.0, ""),
        (3, _ts(1), 2, "signup", 0.0, ""),
        (4, _ts(4), 2, "purchase", 1.0, ""),
        (5, _ts(1), 3, "signup", 0.0, ""),
        (6, _ts(6), 99, "view", 0.0, ""),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = [(r["t_days"], r["n_risk"], r["n_events"], r["surv_ppm"])
           for r in km_survival(ev).collect()]
    assert out == [(1, 3, 1, 666_666), (3, 2, 1, 333_333)]


def test_km_survival_monotone_nonincreasing(spark):
    rows, eid = [], 0
    for u in range(30):
        eid += 1
        rows.append((eid, _ts(1 + u % 3), u, "signup", 0.0, ""))
        if u % 2 == 0:
            eid += 1
            rows.append((eid, _ts(4 + u % 7), u, "purchase", 1.0, ""))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    surv = [r["surv_ppm"] for r in
            sorted(km_survival(ev).collect(), key=lambda r: r["t_days"])]
    assert surv == sorted(surv, reverse=True)
    assert all(0 <= s <= 1_000_000 for s in surv)


def test_clustering_spectrum_hand_graph(spark):
    """Kite {1,2,3},{2,3,4} + pendant 4-5. Sym degrees: 1:2, 2:3, 3:3,
    4:3, 5:1. T: 1:1, 2:2, 3:2, 4:1, 5:0.
    deg 2 class: {1} → cc = 2·1·1e6/(1·2·1) = 1e6.
    deg 3 class: {2,3,4}, ΣT=5 → 2·5·1e6/(3·3·2) = 555555.
    deg 1 class: {5} → 0."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5)], "src long, dst long"
    )
    out = {r["deg"]: r for r in clustering_spectrum(edges).collect()}
    assert out[2]["cc_ppm"] == 1_000_000 and out[2]["n_vertices"] == 1
    assert out[3]["cc_ppm"] == 10_000_000 // 18
    assert out[3]["tri_sum"] == 5
    assert out[1]["cc_ppm"] == 0
