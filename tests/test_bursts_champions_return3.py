"""Round-5 continuation ops, batch 4: integer-z² burst detection,
champion lists, 3-step walk return probability — hand oracles."""

import datetime

from pyspark.sql import functions as F

from drone_spark.algorithms.linkstats import RETURN3_SCALE, walk_return3
from drone_spark.ops.corpusstats import champion_lists
from drone_spark.ops.events import bursts


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )


# --------------------------------------------------------------- bursts
def test_bursts_fires_on_spike_only(spark):
    """24 calm hours at ~10/h then one hour at 100: the spike hour is
    flagged; no calm hour is. Counts alternate 9/11 so the trailing
    variance is small but nonzero."""
    rows, eid = [], 0
    for h in range(25):
        cnt = 100 if h == 24 else (9 if h % 2 == 0 else 11)
        for i in range(cnt):
            rows.append(
                (eid, 1, datetime.datetime(2024, 1, 1, 0, 0, 0)
                 + datetime.timedelta(hours=h, seconds=i), "click", 0.0)
            )
            eid += 1
    out = bursts(_ev(spark, rows)).collect()
    assert len(out) == 1 and out[0]["cnt"] == 100


def test_bursts_needs_min_window(spark):
    """With fewer than min_window trailing hours nothing can fire,
    even for a huge spike."""
    rows, eid = [], 0
    for h in range(5):
        cnt = 100 if h == 4 else 10
        for i in range(cnt):
            rows.append(
                (eid, 1, datetime.datetime(2024, 1, 1, 0, 0, 0)
                 + datetime.timedelta(hours=h, seconds=i), "click", 0.0)
            )
            eid += 1
    assert bursts(_ev(spark, rows)).collect() == []


def test_bursts_one_sided(spark):
    """A DROP below the mean never fires (one-sided test)."""
    rows, eid = [], 0
    for h in range(25):
        cnt = 1 if h == 24 else (9 if h % 2 == 0 else 11)
        for i in range(cnt):
            rows.append(
                (eid, 1, datetime.datetime(2024, 1, 1, 0, 0, 0)
                 + datetime.timedelta(hours=h, seconds=i), "click", 0.0)
            )
            eid += 1
    assert bursts(_ev(spark, rows)).collect() == []


# ------------------------------------------------------- champion lists
def test_champion_lists_hand_oracle(spark):
    docs = spark.createDataFrame(
        [
            (1, "cat cat cat dog"),
            (2, "cat dog dog"),
            (3, "cat bird"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["token"], r["rank"]): (r["doc_id"], r["tf"])
        for r in champion_lists(docs, n_terms=2, per_term=2).collect()
    }
    # volumes: cat=5, dog=3, bird=1 → top-2 terms cat, dog
    assert out[("cat", 1)] == (1, 3)
    assert out[("cat", 2)] == (2, 1)  # tf tie (1) broken by doc_id: 2 < 3
    assert out[("dog", 1)] == (2, 2)
    assert out[("dog", 2)] == (1, 1)
    assert not any(t == "bird" for (t, _r) in out)


# -------------------------------------------------------- walk return 3
def test_walk_return3_triangle(spark):
    """Plain triangle: every vertex has deg 2; two closed 3-walks per
    vertex, each ⌊1e9/8⌋ → return3_fx = 2·125000000. A pendant vertex
    (no triangle) does not appear."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    out = {r["vid"]: r["return3_fx"] for r in walk_return3(edges).collect()}
    # degs: 1:2, 2:2, 3:3, 4:1
    assert out[1] == 2 * (RETURN3_SCALE // (2 * 2 * 3))
    assert out[2] == 2 * (RETURN3_SCALE // (2 * 2 * 3))
    assert out[3] == 2 * (RETURN3_SCALE // (3 * 2 * 2))
    assert 4 not in out


def test_walk_return3_mid_degree_cap(spark):
    """Capping the middle-vertex degree below 3 removes walks whose
    MIDDLE hop is the deg-3 hub but keeps the ones that only start or
    end there."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    out = {r["vid"]: r["return3_fx"]
           for r in walk_return3(edges, max_degree=2).collect()}
    # v=1: walks 1→2→3→1 (mid 2, deg2 ok) kept; 1→3→2→1 (mid 3, deg 3) cut
    assert out[1] == RETURN3_SCALE // (2 * 2 * 3)
    # v=3: both mids (1 and 2) have deg 2 → both walks survive
    assert out[3] == 2 * (RETURN3_SCALE // (3 * 2 * 2))
