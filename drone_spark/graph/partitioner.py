"""Vertex-cut graph partitioner (hybrid-cut with degree-based salting).

The reference consumes a *precomputed* vertex-cut partitioning from
``Master.<i>`` / ``Mirror.<i>`` files whose generator isn't even in the
repo (/root/reference/src/graph/graph.go:382-441, SURVEY.md §4.2). This
module is that missing partitioner, as a one-time DataFrame job:

- **hybrid edge placement** (PowerLyra-style, public literature): an
  edge normally follows ``hash(src)`` so a vertex's out-adjacency is
  co-located (cheap local scatter); but when ``src`` is a high-degree
  hub (out-degree > ``salt_threshold``) the edge follows ``hash(dst)``
  instead — the hub's out-edges are *salted across all partitions*, so
  no single task owns a 10^8-edge adjacency at web scale.
- **master/mirror assignment**: every vertex gets one deterministic
  master partition (``hash(id) % P``, always balanced) and a mirror row
  for each partition where its edges actually live. Combines happen at
  the master (groupBy = the mirror→master route join J2 of SURVEY §2.3),
  broadcasts fan back via the replicas table (J3).

At 100 TB this job runs once per graph version; its outputs are
persisted to the catalog and reused by every algorithm run.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .builder import out_degrees


def _part(col, num_parts: int):
    # xxhash64 is JVM-side and stable across Spark versions; pmod keeps
    # the result non-negative.
    return F.pmod(F.xxhash64(col), F.lit(num_parts)).cast("int")


@dataclass
class PartitionedGraph:
    """Partitioned edge set + replica routing tables.

    edges:    (src, dst, part)           — every input edge exactly once
    replicas: (vid, part, is_master)     — one master row per vertex,
                                           plus mirror rows where edges live
    degrees:  (id, outdeg)               — global out-degree (PageRank scatter)
    num_parts: int

    ``out_routes()``: (vid, part) — partitions holding vid's *out*-edges
    (the master→mirror scatter route for push algorithms like PageRank;
    a subset of replicas, which also lists dst-only partitions).
    """

    edges: DataFrame
    replicas: DataFrame
    degrees: DataFrame
    num_parts: int

    def out_routes(self, edges: DataFrame | None = None) -> DataFrame:
        """(vid, part) — pass the *persisted* partitioned edge table to
        derive from the cache instead of re-running the placement
        lineage (same reasoning as :meth:`presence_routes`)."""
        e = edges if edges is not None else self.edges
        return e.select(F.col("src").alias("vid"), "part").distinct()

    def presence_routes(self, edges: DataFrame | None = None) -> DataFrame:
        """(vid, part) — partitions holding ANY edge incident to vid (the
        mirror set of the replicas table without the master-only rows):
        the scatter route for undirected flooding (CC/LP) and for SSSP
        seeds. Pass the *persisted* partitioned edge table to derive it
        from the cache instead of re-running the placement lineage —
        building it through the full replicas chain (masters+mirrors
        joins) measured ~5 s of one-time prep that a 2-superstep run
        never amortizes."""
        e = edges if edges is not None else self.edges
        return (
            e.select(F.col("src").alias("vid"), "part")
            .unionAll(e.select(F.col("dst").alias("vid"), "part"))
            .distinct()
        )


def partition_graph(
    edges: DataFrame, num_parts: int, salt_threshold: int = 1024
) -> PartitionedGraph:
    """Assign each edge to a partition and build replica tables.

    ``salt_threshold``: out-degree above which a vertex is treated as a
    hub and its out-edges are scattered by ``hash(dst)``. At local test
    scale we lower it to force the salted path to execute.
    """
    deg = out_degrees(edges)  # (id, outdeg)
    hubs = deg.where(F.col("outdeg") > salt_threshold).select(
        F.col("id").alias("src"), F.lit(True).alias("is_hub")
    )
    placed = (
        edges.join(F.broadcast(hubs), "src", "left")
        .withColumn(
            "part",
            F.when(F.col("is_hub").isNotNull(), _part(F.col("dst"), num_parts))
            .otherwise(_part(F.col("src"), num_parts)),
        )
        .drop("is_hub")
    )

    presence = (
        placed.select(F.col("src").alias("vid"), "part")
        .unionAll(placed.select(F.col("dst").alias("vid"), "part"))
        .distinct()
    )
    masters = presence.select("vid").distinct().select(
        "vid", _part(F.col("vid"), num_parts).alias("part"),
        F.lit(True).alias("is_master"),
    )
    mirrors = (
        presence.join(
            masters.select("vid", F.col("part").alias("mpart")), "vid"
        )
        .where(F.col("part") != F.col("mpart"))
        .select("vid", "part", F.lit(False).alias("is_master"))
    )
    replicas = masters.unionByName(mirrors)
    edge_cols = ["src", "dst", "part"] + (
        ["weight"] if "weight" in edges.columns else []
    )
    return PartitionedGraph(
        edges=placed.select(*edge_cols),
        replicas=replicas,
        degrees=deg,
        num_parts=num_parts,
    )
