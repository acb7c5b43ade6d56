"""Exact APSP eccentricity and the Hill tail estimator."""

import math

from pyspark.sql import functions as F

from drone_spark.algorithms.centrality import apsp_eccentricity


def test_apsp_eccentricity_path(spark):
    """Directed path 1→2→3→4: ecc(1)=3 reach 3, ecc(2)=2 reach 2,
    ecc(3)=1 reach 1, ecc(4)=0 reach 0."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    out = {r["vid"]: (r["ecc"], r["n_reached"])
           for r in apsp_eccentricity(edges).collect()}
    assert out == {1: (3, 3), 2: (2, 2), 3: (1, 1), 4: (0, 0)}


def test_apsp_eccentricity_cycle(spark):
    """Directed 5-cycle: every vertex reaches the other 4, ecc = 4."""
    edges = spark.createDataFrame(
        [(i, i % 5 + 1) for i in range(1, 6)], "src long, dst long"
    )
    out = apsp_eccentricity(edges).collect()
    assert all(r["ecc"] == 4 and r["n_reached"] == 4 for r in out)


def test_hill_estimator_pareto_replica(spark):
    """Degrees drawn as a deterministic Pareto(α=2) quantile sequence:
    the Hill estimate over the top order statistics should come out
    near 2 (within the floor-quantization and small-k noise)."""
    n, k = 2000, 100
    degs = [max(1, int(1000 * (i / n) ** (-1 / 2.0) / 10)) for i in
            range(1, n + 1)]
    rows = [(i, d) for i, d in enumerate(degs)]
    df = spark.createDataFrame(rows, "vid long, deg long")
    lim = df.orderBy(F.desc("deg"), F.asc("vid")).limit(k + 1)
    ref = lim.agg(F.min("deg").alias("dr"))
    terms = lim.crossJoin(F.broadcast(ref)).select(
        F.floor(F.lit(1_000_000)
                * F.log(F.col("deg").cast("double") / F.col("dr")))
        .cast("long").alias("t")
    )
    s = terms.agg(F.sum("t")).collect()[0][0]
    alpha = k * 1_000_000 / s
    assert 1.5 < alpha < 2.6, alpha
    # python replica of the floored sum
    top = sorted(degs, reverse=True)[: k + 1]
    dr = min(top)
    s_py = sum(math.floor(1e6 * math.log(d / dr)) for d in top)
    assert s == s_py
