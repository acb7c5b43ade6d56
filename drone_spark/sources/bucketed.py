"""Bucketed edge-table storage — the cross-run zero-edge-shuffle path.

In-session, every iterative algorithm repartitions the edge table once
on its join key and caches it, so no *superstep* re-shuffles edges.
That still pays one full-table shuffle per *run* — at 100 TB the
dominant one-off cost. Storing the edge table **bucketed by the join
key** removes it: a bucketed scan reports ``hashpartitioning(key, B)``
as its output partitioning, Catalyst sees the scatter join's
distribution requirement already satisfied, and only the small
per-vertex state side shuffles. Verified by
tests/test_plans.py::test_bucketed_edges_skip_edge_shuffle — the
edge-side Exchange is present for a plain parquet scan and absent for
the bucketed scan of the same data.

Reference parity: DRONE pre-places each worker's adjacency on disk as
``G.<i>``/``Master.<i>``/``Mirror.<i>`` files so a run never
redistributes edges (/root/reference/src/graph/graph.go:341-441); a
bucketed table is the Spark-native equivalent of that pre-placement,
with Catalyst doing the placement-awareness instead of hand-addressed
files.

Iceberg mapping (see catalog.py for why Iceberg proper is absent in
this sandbox): ``ALTER TABLE edges WRITE ORDERED BY ... PARTITIONED BY
bucket(B, src)`` plus Spark's storage-partitioned join gives the same
exchange elimination on a real cluster; here the bucketing spec lives
in the session's table catalog via ``saveAsTable`` with an explicit
``path`` (external table — no warehouse-dir pollution).

Bucket count should equal ``spark.sql.shuffle.partitions`` (and the
algorithms' ``num_parts``) so the join's required and provided
distributions line up without AQE bucket coalescing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_edges(
    edges: DataFrame,
    name: str,
    path: str,
    n_buckets: int,
    key: str = "src",
) -> None:
    """Persist ``edges`` as an external table bucketed (and sorted)
    by ``key`` — the once-per-corpus placement step.

    The repartition on the bucket key makes each writer task own whole
    buckets, so every bucket lands as ONE file globally sorted on
    ``key`` — without it each upstream task emits a file per bucket it
    touches (tasks×buckets small files) and the per-bucket ``sortBy``
    holds only within each fragment, not the bucket."""
    (
        edges.repartition(n_buckets, key)
        .write.bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(name)
    )


def write_vertexcut_edges(
    edges: DataFrame,
    name: str,
    path: str,
    n_parts: int,
    salt_threshold: int = 1024,
) -> None:
    """Persist ``edges`` vertex-cut partitioned (graph/partitioner.py)
    as a table bucketed by the ``part`` column — the once-per-corpus
    placement step for the cogroup (subgraph-centric) backends, the
    direct analogue of the reference's pre-placed ``G.<i>`` worker
    files (graph.go:341-441). A scan of this table feeds
    ``pagerank_cogroup(pre_partitioned=True)`` with zero per-run
    partitioner job and zero edge shuffle; within each bucket rows are
    sorted by ``src`` for scan locality."""
    from ..graph.partitioner import partition_graph

    # the placement join preserves extra columns; carry weight so the
    # weighted SSSP subgraph backend can serve from this table too
    cols = ["src", "dst"] + (
        ["weight"] if "weight" in edges.columns else []
    )
    pg = partition_graph(edges.select(*cols), n_parts, salt_threshold)
    (
        pg.edges.repartition(n_parts, "part")
        .write.bucketBy(n_parts, "part")
        .sortBy("src")
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(name)
    )


def read_bucketed_edges(spark: SparkSession, name: str) -> DataFrame:
    """Scan the bucketed table — the scan's output partitioning carries
    the bucket spec, so downstream key-joins skip the edge exchange."""
    return spark.table(name)


def prepare_edges(
    edges: DataFrame,
    n_parts: int,
    key: str = "src",
    pre_partitioned: bool = False,
    sort: bool = False,
) -> DataFrame:
    """Shared algorithm-side edge prepare.

    Default: one repartition on ``key`` + persist — paid once per run,
    reused by every superstep. ``pre_partitioned=True`` declares the
    input already distributed on ``key`` (a bucketed-table scan, or a
    caller-managed partitioning): no repartition, no sort — just
    persist, which preserves the scan's output partitioning through the
    InMemoryRelation. ``sort`` is likewise the storage's job on that
    path: tables written by :func:`write_bucketed_edges` are one
    globally-sorted file per bucket, so the sorted-partition property
    some algorithms request (``pagerank_delta``) comes from the scan;
    for caller-managed inputs, sortedness is part of the caller's
    pre_partitioned contract.

    A misdeclared ``pre_partitioned`` input is never *wrong* — Catalyst
    inserts the exchange the join needs — it just silently pays the
    per-run shuffle the flag claims to skip. The detectable misconfigs
    (bucketed reading disabled session-wide; shuffle partitions ≠
    ``n_parts``, which makes the planner shuffle around the buckets)
    warn here; a bucket-count mismatch is not visible from a DataFrame
    and stays on the caller (bucket with ``n_buckets`` = the job's
    ``num_parts``)."""
    if pre_partitioned:
        import warnings

        spark = edges.sparkSession
        if sort:
            warnings.warn(
                "prepare_edges(pre_partitioned=True, sort=True): sortedness "
                "is the storage's contract on this path — tables from "
                "write_bucketed_edges are already one sorted file per "
                "bucket, but a caller-managed pre-partitioned input must "
                "arrive sorted itself; no sortWithinPartitions is applied",
                stacklevel=2,
            )
        if spark.conf.get("spark.sql.sources.bucketing.enabled", "true") != "true":
            warnings.warn(
                "prepare_edges(pre_partitioned=True) but "
                "spark.sql.sources.bucketing.enabled is false — bucketed "
                "scans will not report their distribution and every join "
                "will re-shuffle the edge table",
                stacklevel=2,
            )
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        if shuffle_parts != n_parts:
            warnings.warn(
                f"prepare_edges(pre_partitioned=True) with num_parts="
                f"{n_parts} but spark.sql.shuffle.partitions="
                f"{shuffle_parts}; if the table's bucket count matches "
                "neither, joins re-shuffle the edge table despite the flag",
                stacklevel=2,
            )
        return edges.persist()
    out = edges.repartition(n_parts, key)
    if sort:
        out = out.sortWithinPartitions(key)
    return out.persist()
