"""Graph (dual) simulation pattern matching — reference parity.

Reference semantics (/root/reference/src/algorithm/Sim.go): candidate
pairs seeded by attribute equality (Sim.go:45-68, data-vertex attr is
``id % 100``, graph.go:367 + Settings.go:20); a pair (v,u) *survives*
iff for every pattern successor u' of u, some data successor v' of v is
still matched to u' (the ``postMap`` counters + retraction cascade,
Sim.go:103-172). We compute the same fixpoint relationally: per round,
a requirement table (v,u,u') anti-joined with its witnesses; pairs with
any unwitnessed requirement are retracted; repeat until no retraction.
(The reference's mirror-index routing bug, SimWorker.go:221 — messages
sent to slice indices instead of worker ids — is semantics we
deliberately do not replicate; see SURVEY §2.3.)

Pattern graphs are tiny (the reference ships an 8-line example,
src/pattern.txt) → broadcast joins throughout; the data-side tables are
the only shuffled ones. The fixpoint shrinks monotonically, so each
round's work is bounded by the current match set.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class Pattern:
    """A small directed pattern graph: nodes (id, attr), edges (src, dst)."""

    nodes: list[tuple[int, int]]
    edges: list[tuple[int, int]]


def load_pattern_text(text: str) -> Pattern:
    """Parse the reference's pattern format: ``id attr n t1..tn`` per line
    (graph.go:303-329; example /root/reference/src/pattern.txt)."""
    nodes, edges = [], []
    for line in text.strip().splitlines():
        parts = line.split()
        if not parts:
            continue
        vid, attr, n = int(parts[0]), int(parts[1]), int(parts[2])
        nodes.append((vid, attr))
        edges.extend((vid, int(t)) for t in parts[3 : 3 + n])
    return Pattern(nodes=nodes, edges=edges)


def default_attr(col) -> F.Column:
    """The reference's synthetic vertex attribute: id % 100
    (graph.go:367,374; Settings.go:20)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(c, F.lit(100))


def graph_simulation(
    spark: SparkSession,
    edges: DataFrame,
    pattern: Pattern,
    vertex_attrs: DataFrame | None = None,
    max_rounds: int = 100,
    engine=None,
    run_id: str = "graph_sim",
    resume: bool = False,
    stats: list | None = None,
) -> DataFrame:
    """Dual-simulation match set: (pattern_node, data_node) pairs.

    ``vertex_attrs``: (id, attr); defaults to the reference's id%100.

    Runs the retraction fixpoint on the :class:`SuperstepEngine` like
    every other iterative kernel, so Sim inherits per-superstep
    checkpoints, resume and metrics (the r1 version had its own
    persist/count cycle with none of those). State rows are the seed
    candidate pairs with an ``alive`` flag — retraction flips the flag
    (delta=1), so the metrics ``n_changed`` column traces the
    retraction cascade (Sim.go:103-172) and the state size stays
    constant (bounded by the attr-equality seed set).

    **Incremental retraction** (the reference's cascade as data,
    Sim.go:103-172; VERDICT r2 missing #3): round 1 verifies every
    requirement of every seed pair; every later round re-verifies ONLY
    requirements whose witness set lost a member — (v,u,u') such that a
    data edge v→v' exists with (v',u') retracted last round. A
    requirement witnessed at round r whose witnesses did not retract
    stays witnessed (the match set only shrinks), so skipping it is
    exact, and per-round work is O(|retractions| joined through the
    data edges) instead of O(|sim|·|pattern_edges|). Because delta (the
    retracted-last-round flag) is engine state, the cascade resumes
    correctly from any checkpoint.

    ``stats``: optional list; when given, each round appends
    ``{"round": k, "n_checked": ...}`` — the number of requirements
    re-verified (costs one extra count job per round; tests only)."""
    from ..graph.builder import vertices

    if engine is None:
        import tempfile

        from ..catalog import Catalog
        from ..engine.superstep import SuperstepEngine

        engine = SuperstepEngine(
            spark, Catalog(tempfile.mkdtemp(prefix="sim_")),
            num_parts=8, checkpoint_every=5,
        )

    verts = vertices(edges)
    if vertex_attrs is None:
        vertex_attrs = verts.select("id", default_attr("id").alias("attr"))

    p_nodes = spark.createDataFrame(pattern.nodes, "u long, uattr long")
    p_edges = spark.createDataFrame(pattern.edges, "u long, u2 long")
    # engine state key: one long per (v,u) pair
    u_factor = max(u for u, _ in pattern.nodes) + 1
    data_edges = edges.select("src", "dst").persist()
    n_edges = data_edges.count()

    # in-degree of each data vertex: the edges the incremental touch
    # join walks per retracted pair — carried in state so the engine's
    # metrics scan records real per-round traversal (traversed_expr)
    indeg = data_edges.groupBy(F.col("dst").alias("v")).agg(
        F.count(F.lit(1)).alias("indeg")
    )

    def init() -> DataFrame:
        # seed: attr-equality candidates (Sim.go:45-68) — broadcast join
        return (
            vertex_attrs.join(F.broadcast(p_nodes), F.col("attr") == F.col("uattr"))
            .select(F.col("id").alias("v"), "u")
            .join(indeg, "v", "left")
            .select(
                (F.col("v") * u_factor + F.col("u")).alias("vid"),
                "v", "u",
                F.lit(True).alias("alive"),
                F.coalesce("indeg", F.lit(0)).alias("indeg"),
                F.lit(1.0).alias("delta"),
            )
        )

    def step(state: DataFrame, k: int) -> DataFrame:
        sim = state.where("alive").select("v", "u")
        if k == 1:
            # seed round (PEval): verify every requirement of every pair
            need = sim.join(F.broadcast(p_edges), "u")  # (v, u, u2)
        else:
            # incremental rounds (IncEval): only requirements that lost a
            # witness can flip — walk last round's retractions backwards
            # through the data edges (Sim.go's postMap cascade as a join)
            retracted = state.where(F.col("delta") > 0).select(
                F.col("v").alias("rv"), F.col("u").alias("u2")
            )
            need = (
                retracted.join(data_edges, F.col("rv") == data_edges["dst"])
                .select(F.col("src").alias("v"), "u2")
                .distinct()
                .join(F.broadcast(p_edges), "u2")
                .select("v", "u", "u2")
                .join(sim, ["v", "u"], "left_semi")  # dead pairs stay dead
            )
        if stats is not None:
            stats.append({"round": k, "n_checked": need.count()})
        witnessed = (
            need.join(data_edges, need["v"] == data_edges["src"])
            .join(
                sim.select(F.col("v").alias("v2"), F.col("u").alias("u2x")),
                (F.col("dst") == F.col("v2")) & (F.col("u2") == F.col("u2x")),
                "left_semi",
            )
            .select("v", "u", "u2")
            .distinct()
        )
        bad = (
            need.select("v", "u", "u2")
            .exceptAll(witnessed)
            .select("v", "u")
            .distinct()
            .withColumn("dead", F.lit(True))
        )
        return state.join(bad, ["v", "u"], "left").select(
            "vid", "v", "u",
            (F.col("alive") & F.col("dead").isNull()).alias("alive"),
            "indeg",
            (F.col("alive") & F.col("dead").isNotNull()).cast("double").alias("delta"),
        )

    try:
        res = engine.run(
            run_id, init, step, tol=0.0, max_supersteps=max_rounds,
            resume=resume, edges_per_step=n_edges,
            # real traversal: the next round walks the data edges INTO
            # each retracted pair's data vertex
            traversed_expr=F.when(F.col("delta") > 0, F.col("indeg")).otherwise(F.lit(0)),
        )
    finally:
        data_edges.unpersist()
    return res.state.where("alive").select(
        F.col("u").alias("pattern_node"), F.col("v").alias("data_node")
    )
