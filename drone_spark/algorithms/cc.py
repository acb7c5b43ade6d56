"""Connected components & label propagation — min-label / hash-to-min.

Reference semantics (/root/reference/src/algorithm/CC.go): init
``cc[v] = v`` (:51-54); each superstep floods the minimum label along
edges, with a **local fixpoint inside each partition before any
communication** (DFS to exhaustion, :28-45 — the "subgraph-centric"
claim of README.md:27-29); between supersteps, mirrors and masters
exchange per-vertex minima (:94-99). Label propagation (north_rule) is
the same machinery with ``hash(v)`` as the initial label (hash-to-min);
both converge to a component-constant label, checked exactly.

Two backends, same results:

- ``relational`` — one hash-to-min round per superstep:
  ``state ⋈ sym_edges → groupBy(dst).min → join`` . Supersteps ≈ graph
  diameter; every operator is Catalyst-codegen'd.
- ``subgraph`` (default) — the DRONE-style kernel: edges are
  vertex-cut partitioned once; each superstep cogroups the partition's
  edges with its current labels and runs **union-find to local
  fixpoint inside an Arrow batch** (``applyInPandas``), then a global
  ``groupBy(vid).min`` combines mirrors at masters. Supersteps drop
  from O(diameter) to O(log #partitions) — the reference's entire
  reason for existing (CC.go:28-45), re-expressed as a grouped pandas
  kernel instead of goroutines + gRPC.

Both run under the checkpointing SuperstepEngine, so CC/LP inherit
resume + per-partition metrics.

Unlike the reference's CC result sink — which emits duplicate rows for
mirrored vertices (CCworker.go:257-259, SURVEY §2.1 S10) — the result
here has exactly one row per vertex.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine.superstep import RunResult, SuperstepEngine
from ..graph.partitioner import partition_graph


def _sym_edges(edges: DataFrame) -> DataFrame:
    """Both directions of the undirected graph, self-loops dropped."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    return e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()


def _init_labels(sym: DataFrame, label_expr) -> DataFrame:
    return (
        sym.select(F.col("src").alias("vid"))
        .distinct()
        .select("vid", label_expr(F.col("vid")).alias("label"), F.lit(1.0).alias("delta"))
    )


# ---------------------------------------------------------------------------
# backend: relational hash-to-min
# ---------------------------------------------------------------------------
def _relational_step(sym_r: DataFrame):
    def step(state: DataFrame, _k: int) -> DataFrame:
        msgs = (
            state.select(F.col("vid").alias("src"), "label")
            .join(sym_r, "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.min("label").alias("msg"))
        )
        return (
            state.join(msgs, "vid", "left")
            .select(
                "vid",
                F.least(F.col("label"), F.coalesce("msg", F.col("label"))).alias("label"),
                (F.col("label") > F.least(F.col("label"), F.coalesce("msg", F.col("label"))))
                .cast("double")
                .alias("delta"),
            )
        )

    return step


# ---------------------------------------------------------------------------
# backend: subgraph-centric local fixpoint (union-find per partition)
# ---------------------------------------------------------------------------
def _local_fixpoint_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Union-find over one partition's edges, seeded with current labels.

    Arrow hands us the whole subgraph as one pandas DataFrame — the
    in-memory analogue of a DRONE worker's adjacency maps
    (graph.go:103-122) — and we run the local fixpoint the reference
    implements as a DFS flood (CC.go:28-45).
    Input columns: vid, label, nbr (nbr == -1 for label-only rows).
    Output: (vid, label) with the partition-local minimum per group.
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    vids = pdf["vid"].to_numpy()
    nbrs = pdf["nbr"].to_numpy()
    for v, n in zip(vids, nbrs):
        if n >= 0:
            union(int(v), int(n))
    # group minimum of incoming labels
    roots = pdf["vid"].map(lambda v: find(int(v)))
    out = pd.DataFrame({"vid": pdf["vid"], "root": roots, "label": pdf["label"]})
    min_per_root = out.groupby("root")["label"].transform("min")
    out["label"] = min_per_root
    return out.groupby("vid", as_index=False)["label"].min()


def _subgraph_step(spark: SparkSession, edges_p: DataFrame):
    """edges_p: (src, dst, part) — vertex-cut partitioned, persisted."""

    def step(state: DataFrame, _k: int) -> DataFrame:
        # route current labels to every partition that holds the vertex
        # (master→mirror broadcast J3 as a join), run the local kernel,
        # then combine mirror results back at one row per vertex (J2).
        local = (
            state.select(F.col("vid").alias("src"), "label")
            .join(edges_p, "src")
            .select("part", F.col("src").alias("vid"), "label", F.col("dst").alias("nbr"))
        )
        # vertices appearing only as dst in a partition carry their label too
        dst_side = (
            state.select(F.col("vid").alias("dst"), "label")
            .join(edges_p.select("dst", "part").distinct(), "dst")
            .select("part", F.col("dst").alias("vid"), "label", F.lit(-1).alias("nbr"))
        )
        fixed = (
            local.unionByName(dst_side)
            .groupBy("part")
            .applyInPandas(
                lambda pdf: _local_fixpoint_kernel(pdf),
                schema="vid long, label long",
            )
            .groupBy("vid")
            .agg(F.min("label").alias("msg"))
        )
        return (
            state.join(fixed, "vid", "left")
            .select(
                "vid",
                F.least(F.col("label"), F.coalesce("msg", F.col("label"))).alias("label"),
                (F.col("label") > F.least(F.col("label"), F.coalesce("msg", F.col("label"))))
                .cast("double")
                .alias("delta"),
            )
        )

    return step


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------
def _run_labeling(
    spark: SparkSession,
    engine: SuperstepEngine,
    edges: DataFrame,
    label_expr,
    run_id: str,
    backend: str,
    max_supersteps: int,
    resume: bool,
    num_parts: int | None = None,
    salt_threshold: int = 1024,
) -> RunResult:
    n_parts = num_parts or int(spark.conf.get("spark.sql.shuffle.partitions"))
    sym = _sym_edges(edges)
    if backend == "relational":
        sym_r = sym.repartition(n_parts, "src").persist()
        n_edges = sym_r.count()
        step, cleanup = _relational_step(sym_r), sym_r
    elif backend == "subgraph":
        pg = partition_graph(sym, n_parts, salt_threshold=salt_threshold)
        edges_p = pg.edges.repartition(n_parts, "part").persist()
        n_edges = edges_p.count()
        step, cleanup = _subgraph_step(spark, edges_p), edges_p
    else:
        raise ValueError(f"unknown backend {backend!r}")

    def init() -> DataFrame:
        return _init_labels(sym, label_expr)

    try:
        return engine.run(
            run_id, init, step, tol=0.0, max_supersteps=max_supersteps,
            resume=resume, edges_per_step=n_edges,
        )
    finally:
        cleanup.unpersist()


def connected_components(
    spark: SparkSession,
    engine: SuperstepEngine,
    edges: DataFrame,
    run_id: str = "cc",
    backend: str = "subgraph",
    max_supersteps: int = 100,
    resume: bool = False,
    **kw,
) -> RunResult:
    """Min-vid label per undirected component (exact). State: (vid, label, delta)."""
    return _run_labeling(
        spark, engine, edges, lambda c: c, run_id, backend, max_supersteps, resume, **kw
    )


def label_propagation(
    spark: SparkSession,
    engine: SuperstepEngine,
    edges: DataFrame,
    run_id: str = "lp",
    backend: str = "subgraph",
    max_supersteps: int = 100,
    resume: bool = False,
    label_expr=None,
    **kw,
) -> RunResult:
    """Hash-to-min: labels seeded with a hash of vid (default xxhash64);
    converges to the component-wide minimum hash (exact,
    component-constant). ``label_expr`` overrides the seed hash — e.g. a
    Knuth multiplicative hash when the oracle side can't compute
    xxhash64."""
    return _run_labeling(
        spark, engine, edges, label_expr or (lambda c: F.xxhash64(c)),
        run_id, backend, max_supersteps, resume, **kw,
    )
