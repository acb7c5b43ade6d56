"""Embedding-space diagnostics: kNN-distance outliers and
dimension-truncation recall — constructed geometry oracles."""

import pytest
from pyspark.sql import functions as F

from drone_spark.ops.similarity import dim_truncation_recall, knn_outliers


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_knn_outlier_is_the_isolated_vector(spark):
    """Nine near-identical vectors + one orthogonal: the orthogonal
    vector's 1-NN cosine is ~0 while everyone else's is ~1, so it
    ranks as the top outlier."""
    rows = [(i, [1.0, 0.001 * i, 0.0]) for i in range(9)]
    rows.append((99, [0.0, 0.0, 1.0]))
    out = knn_outliers(_emb(spark, rows), k=1, n=3).collect()
    assert out[0]["vec_id"] == 99
    assert out[0]["knn_cos"] == pytest.approx(0.0, abs=1e-4)
    # remaining rows are the dense-cluster members with cos ≈ 1
    assert out[1]["knn_cos"] > 0.99


def test_knn_outliers_k_and_n_respected(spark):
    rows = [(i, [1.0, float(i)]) for i in range(10)]
    out = knn_outliers(_emb(spark, rows), k=3, n=4).collect()
    assert len(out) == 4
    # ascending knn_cos
    vals = [r["knn_cos"] for r in out]
    assert vals == sorted(vals)


def test_dim_truncation_recall_perfect_when_prefix_carries_signal(spark):
    """Vectors whose last component is ZERO: it contributes nothing to
    any dot product or norm, so truncating it cannot change any
    ranking → every vector has 100% recall."""
    rows = [(i, [float(i + 1), float(i * i % 7), 0.0]) for i in range(12)]
    out = {
        r["recall_pct"]: r["n_vecs"]
        for r in dim_truncation_recall(_emb(spark, rows), dims=2, k=3).collect()
    }
    assert out == {100: 12}


def test_dim_truncation_recall_degrades_when_signal_truncated(spark):
    """All discrimination lives in dims 2-3; truncating to dim 1 makes
    every vector identical in the cheap tier, so ties resolve by id
    and recall drops below 100 for at least some vectors."""
    rows = [(i, [1.0, float(i % 5), float((i * 3) % 7)]) for i in range(15)]
    out = {
        r["recall_pct"]: r["n_vecs"]
        for r in dim_truncation_recall(_emb(spark, rows), dims=1, k=3).collect()
    }
    assert sum(out.values()) == 15
    assert any(pct < 100 for pct in out)
