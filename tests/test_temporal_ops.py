"""Hand oracles for the temporal relational operators: as-of join,
bucketed interval join, rolling distinct actives, integer
autocorrelation, daily-basket frequent triples, and C4-style tile
dedup — plus layout-independence checks (repartitioned input, same
result) for the window/bucket plans."""

import datetime

from pyspark.sql import functions as F

from drone_spark.ops.dedup import tile_dedup_stats
from drone_spark.ops.events import (
    asof_last_touch,
    autocorr_daily,
    frequent_triples,
    interval_join_counts,
    rolling_distinct_users,
)


def _ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, 10, minute, second)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )


def test_asof_picks_latest_preceding_click(spark):
    ev = _ev(
        spark,
        [
            (1, 7, _ts(0), "click", 0.0),
            (2, 7, _ts(5), "click", 0.0),
            (3, 7, _ts(9), "purchase", 10.0),
            (4, 7, _ts(20), "purchase", 10.0),  # still sees click 2
            (5, 8, _ts(3), "purchase", 5.0),  # user 8: no click at all
        ],
    )
    out = {
        r["event_id"]: (r["touch_event_id"], r["gap_us"])
        for r in asof_last_touch(ev).collect()
    }
    assert out[3] == (2, 4 * 60 * 1_000_000)
    assert out[4] == (2, 15 * 60 * 1_000_000)
    assert out[5] == (None, None)


def test_asof_tie_semantics(spark):
    """Click at exactly the purchase ts counts; among equal-ts clicks
    the larger event_id wins."""
    ev = _ev(
        spark,
        [
            (1, 7, _ts(5), "click", 0.0),
            (2, 7, _ts(5), "click", 0.0),
            (3, 7, _ts(5), "purchase", 1.0),
        ],
    )
    (row,) = asof_last_touch(ev).collect()
    assert row["touch_event_id"] == 2 and row["gap_us"] == 0


def test_asof_layout_independent(spark):
    ev = _ev(
        spark,
        [
            (i, i % 3, _ts(i % 50, i % 60), ["click", "purchase"][i % 2], 1.0)
            for i in range(60)
        ],
    )
    a = sorted(map(tuple, asof_last_touch(ev).collect()))
    b = sorted(map(tuple, asof_last_touch(ev.repartition(7)).collect()))
    assert a == b


def test_interval_join_window_edges(spark):
    """Events exactly 60 min before count; 60 min + 1 s does not;
    events after the purchase never count."""
    ev = _ev(
        spark,
        [
            (1, 7, _ts(0), "click", 1.25),  # exactly -60min from minute 60
            (2, 7, datetime.datetime(2024, 1, 1, 9, 59, 59), "view", 9.0),
            (3, 7, _ts(30), "click", 2.00),
            (4, 7, datetime.datetime(2024, 1, 1, 11, 0), "purchase", 0.0),
            (5, 7, datetime.datetime(2024, 1, 1, 11, 1), "click", 4.0),
        ],
    )
    (row,) = interval_join_counts(ev).collect()
    assert row["n_prior"] == 2  # events 1 and 3; 2 too old, 5 after
    assert row["value_c"] == 125 + 200


def test_interval_join_zero_window_rows(spark):
    ev = _ev(spark, [(1, 7, _ts(0), "purchase", 3.0)])
    (row,) = interval_join_counts(ev).collect()
    assert (row["n_prior"], row["value_c"]) == (0, 0)


def test_rolling_actives_hand_case(spark):
    """User 1 active day 1; user 2 active days 1 and 9. Day 1 → 2
    users; days 2..7 → carried by the 7-day trail; day 9 → 1."""
    d = datetime.datetime
    ev = _ev(
        spark,
        [
            (1, 1, d(2024, 1, 1), "click", 0.0),
            (2, 2, d(2024, 1, 1), "click", 0.0),
            (3, 2, d(2024, 1, 9), "click", 0.0),
        ],
    )
    out = {r["day"]: r["users_w"] for r in rolling_distinct_users(ev).collect()}
    # only observed days appear
    assert out == {"2024-01-01": 2, "2024-01-09": 1}


def test_rolling_actives_dedupes_within_day(spark):
    ev = _ev(
        spark,
        [(i, 1, datetime.datetime(2024, 1, 1, i), "click", 0.0) for i in range(5)],
    )
    out = rolling_distinct_users(ev).collect()
    assert len(out) == 1 and out[0]["users_w"] == 1


def test_autocorr_constant_series_zero_dev(spark):
    """Equal daily volume → dev ≡ 0 → num = den = 0 at every lag."""
    d = datetime.datetime
    ev = _ev(
        spark,
        [
            (10 * day + k, 1, d(2024, 1, 1 + day, 8 + k), "click", 0.0)
            for day in range(5)
            for k in range(3)
        ],
    )
    for r in autocorr_daily(ev, max_lag=3).collect():
        assert r["num"] == 0 and r["den"] == 0
        assert r["n_pairs"] == 5 - r["lag"]


def test_autocorr_alternating_series_sign(spark):
    """Volumes 1,3,1,3 → lag-1 products all negative, lag-2 positive."""
    d = datetime.datetime
    rows, eid = [], 0
    for day, n in enumerate([1, 3, 1, 3]):
        for k in range(n):
            rows.append((eid, 1, d(2024, 1, 1 + day, 8 + k), "click", 0.0))
            eid += 1
    ev = _ev(spark, rows)
    out = {r["lag"]: r for r in autocorr_daily(ev, max_lag=2).collect()}
    assert out[1]["num"] < 0 < out[2]["num"]
    assert out[1]["den"] == out[2]["den"] > 0


def test_frequent_triples_daily_basket(spark):
    """One user-day with 3 types (+1 repeat) → exactly one triple with
    n_abc=1; distinct-first means the repeat does not inflate it."""
    d = datetime.datetime
    ev = _ev(
        spark,
        [
            (1, 7, d(2024, 1, 1, 8), "click", 0.0),
            (2, 7, d(2024, 1, 1, 9), "view", 0.0),
            (3, 7, d(2024, 1, 1, 10), "purchase", 0.0),
            (4, 7, d(2024, 1, 1, 11), "click", 0.0),
            (5, 7, d(2024, 1, 2, 8), "click", 0.0),  # 2nd basket, 1 type
        ],
    )
    out = frequent_triples(ev, min_triple=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["a"], r["b"], r["c"], r["n_abc"]) == ("click", "purchase", "view", 1)
    assert r["support_ppm"] == 500_000  # 1 of 2 baskets


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tile_dedup_counts(spark):
    """8-word tiles; doc 1 and doc 2 share their first tile exactly;
    doc 3 is unique; doc 4 too short for any tile."""
    tile = "a b c d e f g h"
    docs = _docs(
        spark,
        [
            (1, tile + " i j k l m n o p"),
            (2, tile + " q r s t u v w x"),
            (3, "z y x w v u t s"),
            (4, "too short"),
        ],
    )
    out = {
        r["doc_id"]: (r["n_tiles"], r["n_dup_tiles"])
        for r in tile_dedup_stats(docs).collect()
    }
    assert out == {1: (2, 1), 2: (2, 1), 3: (1, 0), 4: (0, 0)}


def test_tile_dedup_within_doc_repeat_counts(spark):
    """A tile repeated INSIDE one doc is also a dup (corpus-wide
    occurrence count ≥ 2), matching C4's global line hashing."""
    tile = "a b c d e f g h"
    docs = _docs(spark, [(1, tile + " " + tile)])
    (r,) = tile_dedup_stats(docs).collect()
    assert (r["n_tiles"], r["n_dup_tiles"]) == (2, 2)
