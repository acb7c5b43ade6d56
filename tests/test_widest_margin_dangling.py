"""Round-5 continuation ops, batch 11: widest path (max-min semiring),
centroid margin, dangling stats — hand oracles."""

import pytest
from pyspark.sql import functions as F

from drone_spark.algorithms.sssp import WIDEST_INF, widest_path_fixed
from drone_spark.ops.similarity import centroid_margin


def test_widest_path_bottleneck(spark):
    """1→2 (cap 5) →3 (cap 2); also 1→3 direct cap 1. Widest to 3 =
    max(min(5,2), 1) = 2; to 2 = 5; seed reports 2⁶⁰."""
    hw = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 2), (1, 3, 1)], "src long, dst long, w long"
    )
    out = {r["vid"]: r["width"]
           for r in widest_path_fixed(hw, F.lit(1), iters=4).collect()}
    assert out[1] == WIDEST_INF
    assert out[2] == 5
    assert out[3] == 2


def test_widest_path_hop_bound(spark):
    """Chain 1→2→3→4→5 (caps 9): with iters=2 vertex 4 is unreached
    (width 0 → filtered); with iters=4 it reads 9."""
    hw = spark.createDataFrame(
        [(i, i + 1, 9) for i in range(1, 5)], "src long, dst long, w long"
    )
    two = {r["vid"] for r in widest_path_fixed(hw, F.lit(1), iters=2).collect()}
    assert two == {1, 2, 3}
    four = {r["vid"]: r["width"]
            for r in widest_path_fixed(hw, F.lit(1), iters=4).collect()}
    assert four[5] == 9


def test_widest_path_monotone_in_iters(spark):
    hw = spark.createDataFrame(
        [(1, 2, 3), (2, 3, 7), (3, 1, 2), (1, 3, 1)],
        "src long, dst long, w long",
    )
    w2 = {r["vid"]: r["width"]
          for r in widest_path_fixed(hw, F.lit(1), iters=2).collect()}
    w4 = {r["vid"]: r["width"]
          for r in widest_path_fixed(hw, F.lit(1), iters=4).collect()}
    for v, w in w2.items():
        assert w4[v] >= w


def test_centroid_margin_separable_labels(spark):
    """Two orthogonal tight clusters → every vector's own-centroid
    cosine is 1 and other-centroid cosine 0 → mean margin 1.0."""
    rows = [
        (1, [1.0, 0.0], "x"), (2, [1.0, 0.0], "x"),
        (3, [0.0, 1.0], "y"), (4, [0.0, 1.0], "y"),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    out = {r["label"]: (r["n_vecs"], r["mean_margin"])
           for r in centroid_margin(emb).collect()}
    assert out["x"] == (2, pytest.approx(1.0, abs=1e-6))
    assert out["y"] == (2, pytest.approx(1.0, abs=1e-6))


def test_centroid_margin_confused_label_nonpositive(spark):
    """A label whose vectors sit ON another label's centroid margins
    ≤ 0."""
    rows = [
        (1, [1.0, 0.0], "x"), (2, [1.0, 0.0], "x"),
        (3, [1.0, 0.0], "z"),           # z sits inside x
        (4, [0.0, 1.0], "y"), (5, [0.0, 1.0], "y"),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    out = {r["label"]: r["mean_margin"] for r in centroid_margin(emb).collect()}
    assert out["z"] <= 0.0
