"""Incremental (warm-start) CC across append-only growth + snapshot diff."""

from pyspark.sql import functions as F

from drone_spark.algorithms.cc import connected_components
from drone_spark.algorithms.linkstats import snapshot_diff


def _df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def test_warm_start_matches_cold(spark, engine):
    # two chains that the appended edge merges
    old_edges = [(1, 2), (2, 3), (10, 11), (11, 12), (20, 21)]
    new_edges = old_edges + [(3, 10), (12, 20), (30, 31)]
    old = connected_components(
        spark, engine, _df(spark, old_edges), run_id="ccw_old",
        backend="relational",
    )
    warm = connected_components(
        spark, engine, _df(spark, new_edges), run_id="ccw_warm",
        backend="relational", warm_start=old.state.select("vid", "label"),
    )
    cold = connected_components(
        spark, engine, _df(spark, new_edges), run_id="ccw_cold",
        backend="relational",
    )
    w = {(r.vid, r.label) for r in warm.state.select("vid", "label").collect()}
    c = {(r.vid, r.label) for r in cold.state.select("vid", "label").collect()}
    assert w == c
    # everything merged into the min-vid component plus the new pair
    labels = dict(w)
    assert labels[21] == 1 and labels[12] == 1 and labels[31] == 30


def test_warm_start_saves_supersteps(spark, engine):
    # long path: cold CC pays O(diameter) supersteps; after warm-start
    # on a one-edge append the labels are already exact
    n = 24
    path = [(i, i + 1) for i in range(n)]
    old = connected_components(
        spark, engine, _df(spark, path), run_id="ccs_old",
        backend="relational",
    )
    grown = path + [(n, n + 1)]
    warm = connected_components(
        spark, engine, _df(spark, grown), run_id="ccs_warm",
        backend="relational", warm_start=old.state.select("vid", "label"),
    )
    cold = connected_components(
        spark, engine, _df(spark, grown), run_id="ccs_cold",
        backend="relational",
    )
    assert warm.supersteps < cold.supersteps
    w = {(r.vid, r.label) for r in warm.state.select("vid", "label").collect()}
    c = {(r.vid, r.label) for r in cold.state.select("vid", "label").collect()}
    assert w == c


def test_snapshot_diff_brute(spark):
    a = [(1, 2), (1, 3), (2, 3)]
    b = [(1, 2), (1, 4), (2, 3), (5, 6)]
    got = {
        r.vid: (r.deg_a, r.deg_b, r.added, r.removed)
        for r in snapshot_diff(_df(spark, a), _df(spark, b)).collect()
    }
    assert got == {
        1: (2, 2, 1, 1),  # kept (1,2); removed (1,3); added (1,4)
        2: (1, 1, 0, 0),
        5: (0, 1, 1, 0),
    }


def test_snapshot_diff_identical_snapshots(spark, small_edges):
    d = snapshot_diff(small_edges, small_edges)
    assert d.where((F.col("added") != 0) | (F.col("removed") != 0)).count() == 0
    assert d.where(F.col("deg_a") != F.col("deg_b")).count() == 0
