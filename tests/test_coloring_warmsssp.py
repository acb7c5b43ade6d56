"""greedy_coloring properness/determinism + warm-start SSSP identity."""

from pyspark.sql import functions as F

from drone_spark.algorithms.coloring import greedy_coloring
from drone_spark.algorithms.sssp import sssp


def _df(spark, pairs, schema="src long, dst long"):
    return spark.createDataFrame([tuple(map(int, p)) for p in pairs], schema)


def test_coloring_proper_and_total(spark, small_edges):
    col = greedy_coloring(small_edges).persist()
    sym = (
        small_edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    verts = sym.select(F.col("src").alias("vid")).union(
        sym.select(F.col("dst").alias("vid"))
    ).distinct()
    # total: every vertex colored exactly once
    assert col.count() == verts.count()
    assert col.select("vid").distinct().count() == verts.count()
    # proper: no edge with equal endpoint colors
    a = col.withColumnRenamed("vid", "src").withColumnRenamed("color", "ca")
    b = col.withColumnRenamed("vid", "dst").withColumnRenamed("color", "cb")
    conflicts = sym.join(a, "src").join(b, "dst").where(
        F.col("ca") == F.col("cb")
    ).count()
    assert conflicts == 0
    col.unpersist()


def test_coloring_deterministic_across_layouts(spark):
    pairs = [(i, (i * 7) % 23) for i in range(23) if i != (i * 7) % 23]
    a = sorted(map(tuple, greedy_coloring(_df(spark, pairs)).collect()))
    b = sorted(
        map(
            tuple,
            greedy_coloring(_df(spark, pairs).repartition(11, "dst")).collect(),
        )
    )
    assert a == b


def test_coloring_path_at_most_three_colors(spark):
    # MIS peel is not chromatic-optimal: on a path, after round 0 the
    # residual non-MIS runs have length <= 2 (a run of 3 would
    # contradict maximality), i.e. the residual is a matching, which
    # takes exactly 2 more rounds. So a path uses <= 3 colors.
    col = {r.vid: r.color for r in greedy_coloring(
        _df(spark, [(i, i + 1) for i in range(10)])
    ).collect()}
    assert max(col.values()) <= 2


def test_coloring_star_two_colors(spark):
    # A star is always exactly 2 colors under MIS peel: round 0's MIS
    # is either {center} or the full leaf set; either way the residual
    # edge list is empty and the rest take color 1 together.
    col = {r.vid: r.color for r in greedy_coloring(
        _df(spark, [(0, i) for i in range(1, 12)])
    ).collect()}
    assert max(col.values()) == 1


def test_sssp_warm_start_matches_cold(spark, engine):
    old_edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 9)]
    new_edges = old_edges + [(9, 3), (5, 6)]  # shortcut + extension
    old = sssp(spark, engine, _df(spark, old_edges), source=0,
               run_id="wsssp_old", backend="relational")
    warm = sssp(spark, engine, _df(spark, new_edges), source=0,
                run_id="wsssp_warm", backend="relational",
                warm_start=old.state.select("vid", "dist"))
    cold = sssp(spark, engine, _df(spark, new_edges), source=0,
                run_id="wsssp_cold", backend="relational")
    w = {(r.vid, r.dist) for r in warm.state.select("vid", "dist").collect()}
    c = {(r.vid, r.dist) for r in cold.state.select("vid", "dist").collect()}
    assert w == c
    d = dict(w)
    assert d[3] == 2.0  # via the appended shortcut 0→9→3, not 0→1→2→3
    assert d[6] == 5.0  # the shortcut shortens downstream too: 0→9→3→4→5→6


def test_sssp_warm_start_saves_supersteps(spark, engine):
    n = 20
    path = [(i, i + 1) for i in range(n)]
    old = sssp(spark, engine, _df(spark, path), source=0,
               run_id="wsss_old", backend="relational")
    grown = path + [(n, n + 1)]
    warm = sssp(spark, engine, _df(spark, grown), source=0,
                run_id="wsss_warm", backend="relational",
                warm_start=old.state.select("vid", "dist"))
    cold = sssp(spark, engine, _df(spark, grown), source=0,
                run_id="wsss_cold", backend="relational")
    assert warm.supersteps < cold.supersteps
    w = {(r.vid, r.dist) for r in warm.state.select("vid", "dist").collect()}
    c = {(r.vid, r.dist) for r in cold.state.select("vid", "dist").collect()}
    assert w == c
