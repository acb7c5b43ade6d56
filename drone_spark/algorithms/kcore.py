"""k-core decomposition by parallel peeling.

The k-core is the maximal induced subgraph in which every vertex has
(undirected) degree ≥ k — the standard webgraph density/spam-farm
analysis the reference engine never had (its four compiled kernels are
PR/CC/SSSP/Sim, worker*.go). Peeling is the textbook distributed
algorithm: every round simultaneously drop all vertices whose degree
within the surviving subgraph is < k; the fixpoint is exactly the
k-core (Matula & Beck 1983 — greatest-fixpoint characterization).

Superstep shape (engine-run, so checkpoints/resume/metrics come free):
the symmetrized edge table is deduped, hash-partitioned on ``src`` and
cached ONCE; each round joins it against the current active-vertex set
twice (both endpoints must survive) and recounts degrees — two
broadcast-or-shuffle hash joins plus one partial-agg count, all
codegen. Only the shrinking (vid, active) state shuffles per round; at
100 TB the edge table never moves after placement, the same discipline
as every other kernel here (see pagerank.py module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine.superstep import RunResult, SuperstepEngine


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected simple edge set: both directions, self-loops dropped,
    multi-edges deduped."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    return e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def k_core(
    spark: SparkSession,
    engine: SuperstepEngine,
    edges: DataFrame,
    k: int,
    run_id: str = "kcore",
    max_supersteps: int = 100,
) -> RunResult:
    """Peel to the k-core fixpoint. Result state: every vertex that ever
    carried an edge, with ``active`` = membership in the k-core after
    the final round and ``deg`` = its degree among the vertices that
    were active at the start of that round (== its k-core degree once
    converged). ``tol=0`` termination: the run stops the first round in
    which no vertex is dropped."""
    if k < 1:
        raise ValueError(f"k_core requires k >= 1, got {k}")
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sym = symmetrize(edges).repartition(n_parts, "src").persist()
    n_edges = sym.count()

    def init() -> DataFrame:
        deg = sym.groupBy(F.col("src").alias("vid")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        return deg.select(
            "vid",
            F.lit(True).alias("active"),
            "deg",
            F.lit(1.0).alias("delta"),  # force ≥1 peeling round
        )

    def step(state: DataFrame, _k: int) -> DataFrame:
        act_src = state.where("active").select(F.col("vid").alias("src"))
        act_dst = state.where("active").select(F.col("vid").alias("dst"))
        deg_in = (
            sym.join(act_src, "src")
            .join(act_dst, "dst")
            .groupBy(F.col("src").alias("vid"))
            .agg(F.count(F.lit(1)).alias("deg2"))
        )
        joined = state.join(deg_in, "vid", "left")
        new_active = F.col("active") & (F.coalesce("deg2", F.lit(0)) >= k)
        return joined.select(
            "vid",
            new_active.alias("active"),
            F.coalesce("deg2", F.lit(0)).alias("deg"),
            F.when(F.col("active") != new_active, 1.0)
            .otherwise(0.0)
            .alias("delta"),
        )

    try:
        return engine.run(
            run_id,
            init,
            step,
            tol=0.0,
            max_supersteps=max_supersteps,
            edges_per_step=n_edges,
            # each round re-touches every edge of the surviving subgraph
            traversed_expr=F.when(F.col("active"), F.col("deg")).otherwise(
                F.lit(0)
            ),
        )
    finally:
        sym.unpersist()


def core_members(result: RunResult) -> DataFrame:
    """(vid, deg) rows of the converged k-core."""
    return result.state.where("active").select("vid", "deg")
