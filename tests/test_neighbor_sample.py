"""hash_topk_adjacency / neighbor_sample — exactness, determinism,
hub-safety equivalence."""

import hashlib

from pyspark.sql import Window, functions as F

from drone_spark.algorithms.walks import hash_topk_adjacency, neighbor_sample


def _h(salt, s, d):
    return int(hashlib.md5(f"{salt}:{s}:{d}".encode()).hexdigest()[:15], 16)


def test_topk_matches_single_window(spark, small_edges):
    """Two-phase bucketed top-k ≡ one global window (the SQL twin)."""
    k = 3
    got = {(r.src, r.dst) for r in hash_topk_adjacency(small_edges, k, "t").collect()}
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("t:"),
                    F.col("src").cast("string"),
                    F.lit(":"),
                    F.col("dst").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("src").orderBy(h, "dst")
    want = {
        (r.src, r.dst)
        for r in small_edges.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .collect()
    }
    assert got == want


def test_topk_brute(spark):
    edges = [(1, d) for d in range(2, 12)] + [(2, 3), (2, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.src, r.dst) for r in hash_topk_adjacency(df, 4, "s").collect()}
    want = set()
    for s in (1, 2):
        nbrs = sorted((d for x, d in edges if x == s), key=lambda d: (_h("s", s, d), d))
        want |= {(s, d) for d in nbrs[:4]}
    assert got == want


def test_topk_subset_and_cap(spark, small_edges):
    k = 2
    samp = hash_topk_adjacency(small_edges, k, "c")
    assert samp.join(small_edges.select("src", "dst"), ["src", "dst"], "left_anti").count() == 0
    over = samp.groupBy("src").count().where(F.col("count") > k).count()
    assert over == 0


def test_neighbor_sample_layout_independent(spark, small_edges):
    seeds = (
        small_edges.select(F.col("src").alias("vid")).distinct().limit(5)
    )
    seeds = spark.createDataFrame(
        [(r.vid,) for r in seeds.collect()], "vid long"
    )
    a = {tuple(r) for r in neighbor_sample(small_edges, seeds).collect()}
    b = {
        tuple(r)
        for r in neighbor_sample(small_edges.repartition(13, "dst"), seeds).collect()
    }
    assert a == b and a


def test_neighbor_sample_hops_connect(spark, small_edges):
    seeds = spark.createDataFrame(
        [(r.vid,) for r in small_edges.select(F.col("src").alias("vid")).distinct().limit(4).collect()],
        "vid long",
    )
    res = neighbor_sample(small_edges, seeds, fanout=(3, 2)).persist()
    h1 = res.where("hop = 1")
    h2 = res.where("hop = 2")
    # hop-1 edges start at their root
    assert h1.where(F.col("root") != F.col("src")).count() == 0
    # every hop-2 src is some hop-1 dst for the same root
    orphan = h2.join(
        h1.select("root", F.col("dst").alias("src")).distinct(),
        ["root", "src"],
        "left_anti",
    )
    assert orphan.count() == 0
    res.unpersist()
