"""PageRank — power iteration with damping 0.85 to 1e-6 convergence.

Reference semantics pinned (/root/reference/src/algorithm/PageRank.go):
init ``pr = 1.0`` for every vertex (:19-23); per round
``pr_new = 0.85 * Σ_in pr_u / outdeg_global(u) + 0.15`` (:74, α at :11,
global out-degree from Degree.* files at :28); convergence on the
per-vertex L∞ delta (:76 — reference eps 0.01, north_rule tightens to
1e-6). The fixpoint is *unnormalized* (Σ pr ≈ N); dangling vertices
scatter nothing, exactly like a vertex whose out-edges never existed in
the reference's adjacency.

Physical plan per superstep (one Spark job):

    state(parquet scan) ⋈ edges(cached, pre-hash-partitioned on src)
      → project pr/outdeg → groupBy(dst).sum  [partial agg map-side =
        the reference's hand-rolled message combining, PageRank.go:42-51]
      → left join back to state → new pr + delta

The edge table is shuffled **once** at prepare time
(``repartition(P, src)`` + persist): every iteration's join reuses the
cached hash partitioning, so the per-superstep shuffle is only the
small (vid, rank) state — the same reason the reference co-locates each
worker's adjacency in RAM (graph.go:103-122). Skewed dst hotspots are
handled by Catalyst partial aggregation + AQE skew handling; hub
vertices' out-edges are already spread across partitions by the
vertex-cut partitioner when running on catalog tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine.superstep import RunResult, SuperstepEngine
from ..graph.builder import out_degrees, vertices

DAMPING = 0.85


def pagerank(
    spark: SparkSession,
    engine: SuperstepEngine,
    edges: DataFrame,
    run_id: str = "pagerank",
    tol: float = 1e-6,
    damping: float = DAMPING,
    max_supersteps: int = 200,
    resume: bool = False,
) -> RunResult:
    """Run PageRank; result state = (vid, pr, outdeg, delta)."""
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges_r = (
        edges.select("src", "dst").repartition(n_parts, "src").persist()
    )
    n_edges = edges_r.count()  # materialize cache; also the teps numerator

    def init() -> DataFrame:
        return (
            vertices(edges_r)
            .join(out_degrees(edges_r), "id", "left")
            .select(
                F.col("id").alias("vid"),
                F.lit(1.0).alias("pr"),
                F.coalesce("outdeg", F.lit(0)).alias("outdeg"),
                F.lit(1.0).alias("delta"),  # force ≥1 iteration
            )
        )

    def step(state: DataFrame, _k: int) -> DataFrame:
        contribs = (
            state.where(F.col("outdeg") > 0)
            .select("vid", (F.col("pr") / F.col("outdeg")).alias("w"))
            .join(edges_r, F.col("vid") == F.col("src"))
            .groupBy("dst")
            .agg(F.sum("w").alias("acc"))
        )
        return (
            state.join(contribs, state["vid"] == contribs["dst"], "left")
            .select(
                "vid",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce("acc", F.lit(0.0))
                ).alias("pr"),
                "outdeg",
                F.abs(
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce("acc", F.lit(0.0))
                    - F.col("pr")
                ).alias("delta"),
            )
        )

    try:
        return engine.run(
            run_id,
            init,
            step,
            tol=tol,
            max_supersteps=max_supersteps,
            resume=resume,
            edges_per_step=n_edges,
        )
    finally:
        edges_r.unpersist()
