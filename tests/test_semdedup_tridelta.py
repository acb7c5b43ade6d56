"""Hand oracles for semdedup and triangle_delta."""

from pyspark.sql import functions as F

from drone_spark.algorithms.triangles import triangle_count, triangle_delta
from drone_spark.ops.similarity import semdedup


def _edges(spark, rows, flag=True):
    if flag:
        return spark.createDataFrame(rows, "src long, dst long, is_new boolean")
    return spark.createDataFrame(rows, "src long, dst long")


def test_triangle_delta_buckets(spark):
    """Two triangles: (1,2,3) all old; (3,4,5) with (4,5) new →
    buckets {0:1, 1:1}."""
    e = _edges(
        spark,
        [
            (1, 2, False), (2, 3, False), (1, 3, False),
            (3, 4, False), (4, 5, True), (3, 5, False),
        ],
    )
    out = {r["n_new_edges"]: r["n_triangles"] for r in triangle_delta(e).collect()}
    assert out == {0: 1, 1: 1}


def test_triangle_delta_all_new(spark):
    e = _edges(spark, [(1, 2, True), (2, 3, True), (1, 3, True)])
    out = {r["n_new_edges"]: r["n_triangles"] for r in triangle_delta(e).collect()}
    assert out == {3: 1}


def test_triangle_delta_sums_to_static_count(spark):
    """Histogram total equals triangle_count on the same graph, and the
    0-bucket equals triangle_count on the old-edge subgraph — the
    self-check identity the incremental engine relies on."""
    ring = [(i, (i + 1) % 12) for i in range(12)]
    chords = [(i, (i + 2) % 12) for i in range(12)]
    rows = [(a, b, (a + b) % 3 == 0) for a, b in ring + chords]
    e = _edges(spark, rows)
    hist = {r["n_new_edges"]: r["n_triangles"] for r in triangle_delta(e).collect()}
    total = triangle_count(
        _edges(spark, [(a, b) for a, b, _ in rows], flag=False)
    ).collect()[0]["n_triangles"]
    old = triangle_count(
        _edges(spark, [(a, b) for a, b, f in rows if not f], flag=False)
    ).collect()[0]["n_triangles"]
    assert sum(hist.values()) == total
    assert hist.get(0, 0) == old


def test_triangle_delta_dedupes_and_ors_flags(spark):
    """Duplicate edge rows (both orientations, conflicting flags)
    collapse to one edge with flag = OR."""
    e = _edges(
        spark,
        [
            (1, 2, False), (2, 1, True),  # same edge, flag OR -> new
            (2, 3, False), (1, 3, False),
        ],
    )
    out = {r["n_new_edges"]: r["n_triangles"] for r in triangle_delta(e).collect()}
    assert out == {1: 1}


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semdedup_flags_lower_id_survivor(spark):
    """Two near-identical vectors and one orthogonal: the higher id of
    the near-pair is the duplicate, the lower id survives — IF kmeans
    co-clusters them. With k=1 everything shares a cluster, so the
    test isolates the dedup rule from the clustering."""
    vecs = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.001, 0.0]),
        (3, [0.0, 1.0, 0.0]),
    ]
    out = {r["vec_id"]: r["is_dup"] for r in semdedup(_emb(spark, vecs), k=1, tau=0.95).collect()}
    assert out == {1: False, 2: True, 3: False}


def test_semdedup_tau_excludes_moderate_similarity(spark):
    vecs = [(1, [1.0, 0.0]), (2, [1.0, 1.0])]  # cosine ~= 0.707
    out = {r["vec_id"]: r["is_dup"] for r in semdedup(_emb(spark, vecs), k=1, tau=0.8).collect()}
    assert out == {1: False, 2: False}
    out = {r["vec_id"]: r["is_dup"] for r in semdedup(_emb(spark, vecs), k=1, tau=0.7).collect()}
    assert out[2] is True
