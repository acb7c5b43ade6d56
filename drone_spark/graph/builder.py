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


def vertices(edges: DataFrame, extra: DataFrame | None = None) -> DataFrame:
    """Distinct vertex ids appearing in any edge endpoint.

    ``extra``: optional one-column DataFrame of additional vertex ids —
    the ``Isolateds.<i>`` path of the reference (graph.go:443-457;
    disabled at every reference call site, but SURVEY §2.1 S4 maps it to
    "vertices = edges ∪ isolated from pages table"). Passing the pages
    table's id column keeps degree-0 pages in graph scope, e.g. PageRank
    assigns them the teleport mass 1-α = 0.15.
    """
    v = (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
    )
    if extra is not None:
        v = v.unionAll(extra.select(F.col(extra.columns[0]).alias("id")))
    return v.distinct()


def out_degrees(edges: DataFrame) -> DataFrame:
    """Global out-degree per vertex — the analogue of ``Degree.<i>``
    files (graph.go:462-485), consumed by PageRank's scatter."""
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )


def vertices_with_outdeg(
    edges: DataFrame, extra: DataFrame | None = None
) -> DataFrame:
    """(id, outdeg) for every vertex appearing in any edge endpoint
    (plus ``extra`` ids), in ONE exchange.

    Exactly ``vertices(edges, extra) ⟕ out_degrees(edges)`` with null
    out-degrees filled to 0 — but fused: src endpoints carry weight 1,
    dst/extra endpoints weight 0, one union + sum-aggregate. The
    separate derivation pays two exchanges (the vertices distinct and
    the degree groupBy) plus a join; the fused form pays one groupBy
    over the same union, with map-side partial aggregation doing the
    distinct's work. Used by the iterative algorithms' init plans
    (guide §2.4: remove shuffles outright)."""
    v = edges.select(F.col("src").alias("id"), F.lit(1).alias("_c")).unionAll(
        edges.select(F.col("dst").alias("id"), F.lit(0).alias("_c"))
    )
    if extra is not None:
        v = v.unionAll(
            extra.select(
                F.col(extra.columns[0]).alias("id"), F.lit(0).alias("_c")
            )
        )
    return v.groupBy("id").agg(F.sum("_c").cast("long").alias("outdeg"))


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
