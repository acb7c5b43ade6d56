"""Vertex-cut partitioner invariants (SURVEY §2.1 S2-S3 replacement)."""

from pyspark.sql import functions as F

from drone_spark.graph.partitioner import partition_graph


def test_every_edge_assigned_exactly_once(spark, small_edges):
    pg = partition_graph(small_edges, num_parts=8, salt_threshold=10)
    assert pg.edges.count() == small_edges.count()
    assert pg.edges.where(F.col("part").isNull()).count() == 0
    assert pg.edges.where((F.col("part") < 0) | (F.col("part") >= 8)).count() == 0
    # same (src,dst) multiset
    assert (
        pg.edges.select("src", "dst").exceptAll(small_edges).count() == 0
        and small_edges.exceptAll(pg.edges.select("src", "dst")).count() == 0
    )


def test_exactly_one_master_per_vertex(spark, small_edges):
    pg = partition_graph(small_edges, num_parts=8, salt_threshold=10)
    masters = pg.replicas.where("is_master").groupBy("vid").count()
    assert masters.where("count != 1").count() == 0
    n_vertices = (
        small_edges.select(F.col("src").alias("v"))
        .unionAll(small_edges.select(F.col("dst").alias("v")))
        .distinct()
        .count()
    )
    assert masters.count() == n_vertices


def test_replicas_cover_edge_presence(spark, small_edges):
    pg = partition_graph(small_edges, num_parts=8, salt_threshold=10)
    presence = (
        pg.edges.select(F.col("src").alias("vid"), "part")
        .unionAll(pg.edges.select(F.col("dst").alias("vid"), "part"))
        .distinct()
    )
    uncovered = presence.join(
        pg.replicas.select("vid", "part"), ["vid", "part"], "left_anti"
    )
    assert uncovered.count() == 0


def test_hub_out_edges_are_salted_across_partitions(spark, small_edges):
    # with a low threshold, the top hub's out-edges must span >1 partition
    pg = partition_graph(small_edges, num_parts=8, salt_threshold=5)
    hub = (
        pg.degrees.orderBy(F.desc("outdeg")).limit(1).collect()[0]
    )
    assert hub["outdeg"] > 5
    spread = (
        pg.edges.where(F.col("src") == hub["id"]).select("part").distinct().count()
    )
    assert spread > 1
