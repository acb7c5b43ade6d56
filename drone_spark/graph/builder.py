"""Derive graph side tables from the edge table.

Replaces the reference's offline file zoo — ``G.<i>`` adjacency,
``Degree.<i>`` global out-degree, ``Isolateds.<i>``
(/root/reference/src/graph/graph.go:332-485) — with DataFrame
derivations that Catalyst executes as scan + partial-agg + final-agg
(map-side combine for free, the thing the reference hand-rolls as
message combining at PageRank.go:42-51).

All functions take/return DataFrames so at 100 TB they read the
bucketed catalog table and the degree tables are computed once and
persisted, never per-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def vertices(edges: DataFrame) -> DataFrame:
    """Distinct vertex ids appearing in any edge endpoint.

    (The reference's isolated-vertex path is dead code — disabled at
    every call site, graph.go:443-457 / PRWorker.go:366 — so vertices
    not in any edge are out of graph scope here too; the pages table
    retains them for non-graph queries.)
    """
    return (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def out_degrees(edges: DataFrame) -> DataFrame:
    """Global out-degree per vertex — the analogue of ``Degree.<i>``
    files (graph.go:462-485), consumed by PageRank's scatter."""
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )


def degrees(edges: DataFrame) -> DataFrame:
    """(id, outdeg, indeg) with zeros filled — one pass each side."""
    outd = out_degrees(edges)
    ind = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("indeg")
    )
    return (
        outd.join(ind, "id", "full_outer")
        .select(
            "id",
            F.coalesce("outdeg", F.lit(0)).alias("outdeg"),
            F.coalesce("indeg", F.lit(0)).alias("indeg"),
        )
    )


def undirected_edges(edges: DataFrame) -> DataFrame:
    """Symmetrized, deduped, self-loop-free edge set (CC/LP/triangles
    operate on the undirected graph; reference CC does the same by
    flooding labels along out-edges of a symmetrized input)."""
    canon = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).where(F.col("a") != F.col("b")).distinct()
    return canon
