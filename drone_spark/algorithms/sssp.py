"""Single-source shortest paths — reference-parity algorithm.

Reference semantics (/root/reference/src/algorithm/SSSP.go): init every
distance to +∞ (SSSPworker.go:24-31), seed one source with 0, relax
along out-edges keeping per-vertex minima (monotone-improvement filter
SSSP.go:145-150), iterate to fixpoint. Two reference quirks NOT
replicated (SURVEY §7): the hard-coded source vertex 73723936
(SSSPworker.go:160) becomes a parameter, and edge weights — which the
reference parses then discards, forcing 1.0 (graph.go:357-362) — are
honored when a ``weight`` column exists.

Frontier-delta evaluation: only vertices improved in the previous
superstep re-scatter (the reference's ``updatedSet``, SSSP.go:152-161) —
expressed as a filter on the state's ``delta`` column, so late
supersteps touch a shrinking fraction of the graph.

Unreached vertices are dropped from the result, matching the
reference's sink filter (SSSPworker.go:270).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine.superstep import RunResult, SuperstepEngine
from ..graph.builder import vertices

INF = float("inf")


def sssp(
    spark: SparkSession,
    engine: SuperstepEngine,
    edges: DataFrame,
    source: int,
    run_id: str = "sssp",
    max_supersteps: int = 200,
    resume: bool = False,
) -> RunResult:
    """State: (vid, dist, delta); delta>0 marks the current frontier."""
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    weighted = "weight" in edges.columns
    cols = ["src", "dst"] + (["weight"] if weighted else [])
    edges_r = edges.select(*cols).repartition(n_parts, "src").persist()
    n_edges = edges_r.count()
    w = F.col("weight") if weighted else F.lit(1.0)

    def init() -> DataFrame:
        return vertices(edges_r).select(
            F.col("id").alias("vid"),
            F.when(F.col("id") == source, 0.0).otherwise(INF).alias("dist"),
            F.when(F.col("id") == source, 1.0).otherwise(0.0).alias("delta"),
        )

    def step(state: DataFrame, _k: int) -> DataFrame:
        msgs = (
            state.where(F.col("delta") > 0)  # frontier only
            .select(F.col("vid").alias("src"), "dist")
            .join(edges_r, "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.min(F.col("dist") + w).alias("msg"))
        )
        return (
            state.join(msgs, "vid", "left")
            .select(
                "vid",
                F.least("dist", F.coalesce("msg", F.col("dist"))).alias("dist"),
                (F.col("dist") > F.least("dist", F.coalesce("msg", F.col("dist"))))
                .cast("double")
                .alias("delta"),
            )
        )

    try:
        return engine.run(
            run_id, init, step, tol=0.0, max_supersteps=max_supersteps,
            resume=resume, edges_per_step=n_edges,
        )
    finally:
        edges_r.unpersist()


def reached(result_state: DataFrame) -> DataFrame:
    """Result sink semantics: drop unreached vertices (SSSPworker.go:270)."""
    return result_state.where(F.col("dist") != INF).select("vid", "dist")
