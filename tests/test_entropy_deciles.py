"""Outlink entropy (micro-nats) and decile banding invariants."""

import math

from pyspark.sql import functions as F

from drone_spark.ops.fusion import ordinal_rank


def test_outlink_entropy_hand_oracle(spark):
    """Host with outlinks weighted (2, 2): H = ln 2 exactly.
    Host with one outlink: H = 0."""
    hg = spark.createDataFrame(
        [("a", "x", 2), ("a", "y", 2), ("b", "z", 7)],
        "src string, dst string, w long",
    )
    tot = hg.groupBy("src").agg(F.sum("w").alias("wt"))
    out = {
        r["host"]: r["entropy_micro"]
        for r in hg.join(tot, "src")
        .select(
            "src",
            "wt",
            (
                F.col("w")
                * F.floor(
                    F.lit(1_000_000)
                    * F.log(F.col("wt").cast("double") / F.col("w"))
                ).cast("long")
            ).alias("term"),
        )
        .groupBy(F.col("src").alias("host"), "wt")
        .agg(F.expr("CAST(SUM(term) DIV first(wt) AS BIGINT)").alias(
            "entropy_micro"))
        .collect()
    }
    assert out["a"] == math.floor(1e6 * math.log(2))
    assert out["b"] == 0


def test_decile_bands_are_equal_count(spark):
    """(10·(r−1)) DIV n over a rank permutation gives 10 bands of
    n/10 each when 10 | n."""
    df = spark.createDataFrame(
        [(i, (i * 17) % 31) for i in range(100)], "vid long, score long"
    )
    ranked = ordinal_rank(df, "score", "vid", rank_col="r")
    bands = (
        ranked.select(F.expr("(10 * (r - 1)) DIV 100").alias("d"))
        .groupBy("d")
        .count()
        .collect()
    )
    assert {r["d"] for r in bands} == set(range(10))
    assert all(r["count"] == 10 for r in bands)
