"""Deterministic random walks vs the Python md5-step oracle."""

from pyspark.sql import functions as F

from drone_spark.algorithms.walks import deterministic_walks
from tests.oracles import py_walks


def test_walks_match_python_oracle(spark, small_edges, small_edges_pd):
    edge_list = list(small_edges_pd.itertuples(index=False, name=None))
    seed_vids = sorted({s for s, _ in edge_list})[::11][:30]
    seeds = spark.createDataFrame([(v,) for v in seed_vids], "vid long")
    got = {
        r.start: (r.v1, r.v2, r.v3, r.v4)
        for r in deterministic_walks(small_edges, seeds, steps=4).collect()
    }
    assert got == py_walks(edge_list, seed_vids, 4)


def test_walks_stop_at_sinks(spark):
    # 1 -> 2 -> 3, 3 is a sink: walk from 1 is (2, 3, None, None)
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "vid long")
    row = deterministic_walks(df, seeds, steps=4).collect()[0]
    assert (row.v1, row.v2, row.v3, row.v4) == (2, 3, None, None)


def test_walks_deterministic_across_partitioning(spark, small_edges):
    seeds = small_edges.select(F.col("src").alias("vid")).distinct().limit(20)
    a = deterministic_walks(small_edges, seeds, steps=3).collect()
    b = deterministic_walks(small_edges.repartition(13), seeds, steps=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
