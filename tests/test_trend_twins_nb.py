"""Hand oracles for theilsen_trend, twin_classes, nb_confusion."""

import datetime

from pyspark.sql import functions as F

from drone_spark.algorithms.linkstats import twin_classes
from drone_spark.ops.classify import nb_confusion
from drone_spark.ops.events import theilsen_trend


def _ev_days(spark, counts):
    d = datetime.datetime
    rows, eid = [], 0
    for day, n in enumerate(counts):
        for k in range(n):
            rows.append((eid, 1, d(2024, 1, 1 + day, 8, k), "click", 0.0))
            eid += 1
    return spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )


def test_theilsen_linear_series(spark):
    """Volumes 1,2,3,4 → every pairwise slope is exactly 1/day."""
    (r,) = theilsen_trend(_ev_days(spark, [1, 2, 3, 4])).collect()
    assert (r["n_days"], r["n_pairs"]) == (4, 6)
    assert r["median_slope_ppm"] == 1_000_000


def test_theilsen_ignores_outlier_day(spark):
    """1,2,3,59,5,6,7: the spike perturbs 6 of 21 slopes; the median
    stays the underlying +1/day."""
    (r,) = theilsen_trend(_ev_days(spark, [1, 2, 3, 59, 5, 6, 7])).collect()
    assert r["median_slope_ppm"] == 1_000_000


def test_theilsen_negative_slope_floor_parity(spark):
    """Falling series with a non-integer slope: -3 events over 2 days
    → floor(-1.5e6) = -1500000 (floor, not trunc — the DuckDB //
    convention)."""
    (r,) = theilsen_trend(_ev_days(spark, [4, 1])).collect()
    assert r["median_slope_ppm"] == -3_000_000
    (r,) = theilsen_trend(_ev_days(spark, [5, 4, 2])).collect()
    # slopes: (4-5)/1=-1e6, (2-4)/1=-2e6, (2-5)/2=floor(-1.5e6)=-1500000
    assert r["median_slope_ppm"] == -1_500_000


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def test_twin_classes_histogram(spark):
    """1 and 2 share {10,11}; 3 alone has {10}; 4 alone has {12}."""
    e = _edges(
        spark,
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10), (4, 12)],
    )
    out = {r["class_size"]: (r["n_classes"], r["n_vertices"])
           for r in twin_classes(e).collect()}
    assert out == {2: (1, 2), 1: (2, 2)}


def test_twins_get_equal_pagerank(spark, engine):
    """The compression-soundness property twin_classes relies on:
    vertices with identical in-flows and identical out-sets score
    equal PageRank (relational backend, tight tolerance)."""
    from drone_spark.algorithms.pagerank import pagerank

    e2 = _edges(spark, [(1, 3), (1, 4), (2, 3), (2, 4), (3, 5), (4, 5)])
    res = pagerank(
        spark, engine, e2, run_id="twins_pr", tol=1e-12, max_supersteps=60
    )
    s2 = {r["vid"]: r["pr"] for r in res.state.collect()}
    assert abs(s2[1] - s2[2]) < 1e-9
    assert abs(s2[3] - s2[4]) < 1e-9


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_nb_confusion_separable_sources(spark):
    """Source A docs say 'apple banana', source B docs say 'zebra yak';
    perfectly separable → diagonal confusion matrix on the odd half."""
    rows = []
    for i in range(8):
        rows.append((2 * i, "apple banana apple", "A"))
        rows.append((2 * i + 1, "apple banana banana apple", "A"))
    for i in range(8, 16):
        rows.append((2 * i, "zebra yak zebra", "B"))
        rows.append((2 * i + 1, "zebra yak yak zebra", "B"))
    out = {(r["true_source"], r["pred_source"]): r["n_docs"]
           for r in nb_confusion(_docs(spark, rows)).collect()}
    assert out == {("A", "A"): 8, ("B", "B"): 8}


def test_nb_unseen_tokens_dropped(spark):
    """A test doc made of out-of-vocabulary tokens falls back to the
    prior → predicted as the majority class, not an error."""
    rows = [
        (0, "apple apple", "A"), (2, "apple banana", "A"),
        (4, "apple fruit", "A"), (6, "zebra yak", "B"),
        (1, "qqq www eee", "B"),  # odd id, all OOV
    ]
    out = {(r["true_source"], r["pred_source"]): r["n_docs"]
           for r in nb_confusion(_docs(spark, rows)).collect()}
    # only doc 1 is in the test half; prior favors A (3 of 4 train docs)
    assert out == {("B", "A"): 1}
