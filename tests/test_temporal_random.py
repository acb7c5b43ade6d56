"""Randomized brute-force oracles for the temporal operators: the
Spark plans (union+window as-of, bucketed interval join, spread-based
rolling actives) against a plain-Python reference on seeded random
event sets — the formulations share nothing, so agreement pins the
bucketing/window edge cases (bucket boundaries, ties, empty windows)."""

import datetime
import random

import pytest

from drone_spark.ops.events import (
    asof_last_touch,
    interval_join_counts,
    rolling_distinct_users,
)

EPOCH = datetime.datetime(2024, 1, 1)


def _gen(seed, n=120):
    rng = random.Random(seed)
    rows = []
    for eid in range(n):
        rows.append(
            (
                eid,
                rng.randrange(4),  # user
                EPOCH + datetime.timedelta(seconds=rng.randrange(0, 3 * 86400)),
                rng.choice(["click", "view", "purchase"]),
                round(rng.uniform(0, 50), 2),
            )
        )
    return rows


def _df(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_asof_matches_bruteforce(spark, seed):
    rows = _gen(seed)
    got = {
        r["event_id"]: (r["touch_event_id"], r["gap_us"])
        for r in asof_last_touch(_df(spark, rows)).collect()
    }
    exp = {}
    for eid, u, ts, typ, _ in rows:
        if typ != "purchase":
            continue
        cands = [
            (c_ts, c_eid)
            for c_eid, c_u, c_ts, c_typ, _ in rows
            if c_typ == "click" and c_u == u and c_ts <= ts
        ]
        if cands:
            bts, bid = max(cands)
            exp[eid] = (bid, int((ts - bts).total_seconds() * 1_000_000))
        else:
            exp[eid] = (None, None)
    assert got == exp


@pytest.mark.parametrize("seed", [3, 9, 77])
def test_interval_join_matches_bruteforce(spark, seed):
    rows = _gen(seed)
    got = {
        r["event_id"]: (r["n_prior"], r["value_c"])
        for r in interval_join_counts(_df(spark, rows)).collect()
    }
    exp = {}
    hour = datetime.timedelta(hours=1)
    for eid, u, ts, typ, _ in rows:
        if typ != "purchase":
            continue
        hits = [
            c_val
            for _, c_u, c_ts, c_typ, c_val in rows
            if c_typ != "purchase" and c_u == u and ts - hour <= c_ts <= ts
        ]
        exp[eid] = (
            len(hits),
            sum(round(v * 100) for v in hits),
        )
    assert got == exp


@pytest.mark.parametrize("seed", [5, 11])
def test_rolling_actives_matches_bruteforce(spark, seed):
    rows = _gen(seed, n=200)
    got = {
        r["day"]: r["users_w"]
        for r in rolling_distinct_users(_df(spark, rows)).collect()
    }
    pairs = {(u, ts.date()) for _, u, ts, _, _ in rows}
    days = sorted({d for _, d in pairs})
    exp = {}
    for d in days:
        exp[str(d)] = len(
            {u for u, pd in pairs if 0 <= (d - pd).days <= 6}
        )
    assert got == exp
