"""Strongly connected components and web bowtie decomposition.

SCC is *the* canonical directed-link-graph analysis (Broder et al.,
"Graph structure in the Web", WWW 2000): the web graph's bowtie —
giant CORE SCC, IN pages that reach it, OUT pages it reaches — is
computed from exactly this primitive. The reference engine ships only
undirected CC (CC.go); SCC is the directed completion of that kernel,
built here from the same superstep machinery (frontier-filtered
min-label floods under the checkpointing engine).

Algorithm: iterative **trim + forward coloring + backward reach**
(Orzan's coloring algorithm with the FW-BW trim step; both public —
Orzan 2004, McLendon et al. 2005, Slota et al. 2014):

1. **Trim** — iteratively peel vertices with zero in- or out-degree
   in the remaining subgraph; each is its own singleton SCC. On web
   graphs this removes the tendril mass (most of the graph, per the
   bowtie papers) in rounds proportional to tendril depth, using the
   same frontier-*decrement* formulation as k-core (kcore.py: a
   round's cost is O(vertices dropped), never an O(E) recount —
   measured 11× there).
2. **Forward coloring** — flood ``F(v) = min{u live : u →* v}`` along
   edge direction to fixpoint (frontier-filtered min-label, the CC
   step shape). Every color class contains its root ``r = F(r)``, and
   ``r`` is the minimum id *in* its SCC, so emitted scc_ids are the
   canonical min-member labels — deterministic and layout-independent.
3. **Backward reach** — restricted to edges whose endpoints share a
   color (all intra-SCC paths do, provably), flood reachability from
   the roots along *reversed* edges; every vertex reached has
   ``v →* F(v)`` and ``F(v) →* v``, i.e. SCC(root) exactly. Assign,
   remove, repeat on the residue.

Each outer round assigns at least one whole SCC per surviving color
class and the trim fixpoint guarantees the live residue is cycle-rich,
so random/web-like graphs finish in a handful of outer rounds (the
giant SCC goes in round 1). Every inner phase is an ``engine.run`` —
per-superstep checkpoints, convergence metrics and real traversed-edge
counters come free, same as PR/CC/SSSP.

At-scale shape: the remaining-subgraph edge table is repartitioned on
``src`` once per outer round and every inner superstep reuses that
partitioning (frontier joins on the edge side's existing hash
distribution — no per-superstep edge shuffle, the same plan discipline
as pagerank.py). The reversed copy pays its own single shuffle per
round. All label math is Catalyst codegen; there is no Python row
path anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine.superstep import SuperstepEngine


def _vertices(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("vid"))
        .unionAll(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )


def _trim(
    engine: SuperstepEngine,
    verts: DataFrame,
    fwd: DataFrame,
    rev: DataFrame,
    run_id: str,
    max_supersteps: int,
):
    """Peel zero-in/out-degree vertices to fixpoint. Returns the final
    state: (vid, active, indeg, outdeg, odeg, delta); ``active`` rows
    form the cycle-rich residue (every survivor has ≥1 live in-edge
    AND ≥1 live out-edge), inactive rows are singleton SCCs."""

    def init() -> DataFrame:
        ind = fwd.groupBy(F.col("dst").alias("vid")).agg(
            F.count(F.lit(1)).alias("indeg")
        )
        outd = fwd.groupBy(F.col("src").alias("vid")).agg(
            F.count(F.lit(1)).alias("outdeg")
        )
        return (
            verts.join(ind, "vid", "left")
            .join(outd, "vid", "left")
            .select(
                "vid",
                F.lit(True).alias("active"),
                F.coalesce("indeg", F.lit(0)).alias("indeg"),
                F.coalesce("outdeg", F.lit(0)).alias("outdeg"),
                (F.coalesce("indeg", F.lit(0)) + F.coalesce("outdeg", F.lit(0))).alias("odeg"),
                F.lit(1.0).alias("delta"),
            )
        )

    def step(state: DataFrame, _k: int) -> DataFrame:
        # frontier = vertices peeling THIS round; only they touch edges
        dropping = state.where(
            F.col("active") & ((F.col("indeg") <= 0) | (F.col("outdeg") <= 0))
        ).select(F.col("vid").alias("src"))
        # a dropped u decrements indeg of its out-neighbors ...
        dec_in = (
            fwd.join(dropping, "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.count(F.lit(1)).alias("din"))
        )
        # ... and outdeg of its in-neighbors (reversed copy: join stays
        # on rev's own src hash distribution)
        dec_out = (
            rev.join(dropping, "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.count(F.lit(1)).alias("dout"))
        )
        joined = state.join(dec_in, "vid", "left").join(dec_out, "vid", "left")
        new_active = (
            F.col("active") & (F.col("indeg") > 0) & (F.col("outdeg") > 0)
        )
        # frontier-internal decrements land on already-dead vertices,
        # harmlessly (same note as kcore.py)
        return joined.select(
            "vid",
            new_active.alias("active"),
            (F.col("indeg") - F.coalesce("din", F.lit(0))).alias("indeg"),
            (F.col("outdeg") - F.coalesce("dout", F.lit(0))).alias("outdeg"),
            "odeg",
            F.when(F.col("active") != new_active, 1.0).otherwise(0.0).alias("delta"),
        )

    return engine.run(
        run_id, init, step, tol=0.0, max_supersteps=max_supersteps,
        traversed_expr=F.when(F.col("delta") > 0, F.col("odeg")).otherwise(F.lit(0)),
    )


def _min_flood(
    engine: SuperstepEngine,
    verts: DataFrame,
    edges: DataFrame,
    run_id: str,
    max_supersteps: int,
):
    """Frontier-filtered min-label flood along ``edges`` direction
    (the CC relational step over a directed table). Fixpoint state
    carries ``label = min{u : u →* v} ∪ {v}``."""
    from ..graph.builder import out_degrees

    def init() -> DataFrame:
        return (
            verts.join(
                out_degrees(edges).select(F.col("id").alias("vid"), "outdeg"),
                "vid",
                "left",
            )
            .select(
                "vid",
                F.col("vid").alias("label"),
                F.coalesce("outdeg", F.lit(0)).alias("outdeg"),
                F.lit(1.0).alias("delta"),
            )
        )

    def step(state: DataFrame, _k: int) -> DataFrame:
        cand = (
            state.where(F.col("delta") > 0)
            .select(F.col("vid").alias("src"), "label")
            .join(edges, "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.min("label").alias("msg"))
        )
        new_label = F.least(F.col("label"), F.coalesce("msg", F.col("label")))
        return state.join(cand, "vid", "left").select(
            "vid",
            new_label.alias("label"),
            "outdeg",
            (F.col("label") > new_label).cast("double").alias("delta"),
        )

    return engine.run(
        run_id, init, step, tol=0.0, max_supersteps=max_supersteps,
        traversed_expr=F.when(F.col("delta") > 0, F.col("outdeg")).otherwise(F.lit(0)),
    )


def _reach_flood(
    engine: SuperstepEngine,
    seeds_state: DataFrame,
    edges: DataFrame,
    run_id: str,
    max_supersteps: int,
):
    """Boolean reachability flood along ``edges`` from the rows of
    ``seeds_state`` (vid, reached∈{0,1}) — OR-combine, frontier = rows
    that flipped last superstep."""
    from ..graph.builder import out_degrees

    def init() -> DataFrame:
        return (
            seeds_state.join(
                out_degrees(edges).select(F.col("id").alias("vid"), "outdeg"),
                "vid",
                "left",
            )
            .select(
                "vid",
                "reached",
                F.coalesce("outdeg", F.lit(0)).alias("outdeg"),
                F.col("reached").cast("double").alias("delta"),
            )
        )

    def step(state: DataFrame, _k: int) -> DataFrame:
        cand = (
            state.where((F.col("delta") > 0) & (F.col("reached") == 1))
            .select(F.col("vid").alias("src"))
            .join(edges, "src")
            .select(F.col("dst").alias("vid"))
            .distinct()
            .withColumn("msg", F.lit(1))
        )
        new_reached = F.greatest(F.col("reached"), F.coalesce("msg", F.lit(0)))
        return state.join(cand, "vid", "left").select(
            "vid",
            new_reached.alias("reached"),
            "outdeg",
            (new_reached > F.col("reached")).cast("double").alias("delta"),
        )

    return engine.run(
        run_id, init, step, tol=0.0, max_supersteps=max_supersteps,
        traversed_expr=F.when(F.col("delta") > 0, F.col("outdeg")).otherwise(F.lit(0)),
    )


def strongly_connected_components(
    spark: SparkSession,
    engine: SuperstepEngine,
    edges: DataFrame,
    run_id: str = "scc",
    max_outer: int = 30,
    max_supersteps: int = 200,
    num_parts: int | None = None,
) -> DataFrame:
    """Exact SCC labels: one row per vertex of ``edges`` (src ∪ dst),
    ``scc_id`` = the minimum vertex id in the vertex's strongly
    connected component. Self-loops don't affect membership and are
    dropped; vertices appearing only in self-loops are singletons.

    Returns a persisted (vid, scc_id) DataFrame. Inner phases run under
    ``engine`` with run ids ``{run_id}/r{round}/{trim|fwd|bwd}`` so
    their checkpoints/metrics land in the catalog like any other run.
    """
    n_parts = num_parts or int(spark.conf.get("spark.sql.shuffle.partitions"))
    all_verts = _vertices(edges).persist()
    rem_e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    rem_v = all_verts
    assigned: list[DataFrame] = []
    pinned: list[DataFrame] = [all_verts]

    for rnd in range(max_outer):
        fwd = rem_e.repartition(n_parts, "src").persist()
        n_e = fwd.count()
        if n_e == 0:
            assigned.append(rem_v.select("vid", F.col("vid").alias("scc_id")))
            rem_v = None
            break
        rev = (
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            .repartition(n_parts, "src")
            .persist()
        )
        pinned.extend([fwd, rev])

        trim = _trim(
            engine, rem_v, fwd, rev, f"{run_id}/r{rnd}/trim", max_supersteps
        )
        singles = trim.state.where(~F.col("active")).select(
            "vid", F.col("vid").alias("scc_id")
        )
        assigned.append(singles)
        live_v = trim.state.where(F.col("active")).select("vid").persist()
        pinned.append(live_v)
        if live_v.count() == 0:
            rem_v = None
            break

        # live-induced subgraph (edges into trimmed vertices must not
        # leak their labels into the coloring)
        fwd_live = (
            fwd.join(live_v.withColumnRenamed("vid", "src"), "src")
            .join(live_v.withColumnRenamed("vid", "dst"), "dst")
            .select("src", "dst")
            .repartition(n_parts, "src")
            .persist()
        )
        pinned.append(fwd_live)

        color = _min_flood(
            engine, live_v, fwd_live, f"{run_id}/r{rnd}/fwd", max_supersteps
        )
        flab = color.state.select("vid", "label")

        # intra-color reversed edges: every intra-SCC path is color-
        # internal (see module docstring), so the backward flood from
        # the roots cannot escape its SCC
        bwd = (
            fwd_live.join(
                flab.select(F.col("vid").alias("src"), F.col("label").alias("fs")),
                "src",
            )
            .join(
                flab.select(F.col("vid").alias("dst"), F.col("label").alias("fd")),
                "dst",
            )
            .where(F.col("fs") == F.col("fd"))
            .select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            .repartition(n_parts, "src")
            .persist()
        )
        pinned.append(bwd)

        seeds = flab.select(
            "vid", (F.col("label") == F.col("vid")).cast("int").alias("reached")
        )
        reach = _reach_flood(
            engine, seeds, bwd, f"{run_id}/r{rnd}/bwd", max_supersteps
        )
        done = (
            reach.state.where(F.col("reached") == 1)
            .select("vid")
            .join(flab, "vid")
            .select("vid", F.col("label").alias("scc_id"))
            .persist()
        )
        pinned.append(done)

        rem_v = live_v.join(done, "vid", "left_anti").persist()
        pinned.append(rem_v)
        assigned.append(done)
        if rem_v.count() == 0:
            rem_v = None
            break
        rem_e = (
            fwd_live.join(rem_v.withColumnRenamed("vid", "src"), "src")
            .join(rem_v.withColumnRenamed("vid", "dst"), "dst")
            .select("src", "dst")
        )
    else:
        raise RuntimeError(
            f"SCC did not converge within max_outer={max_outer} rounds"
        )

    out = assigned[0]
    for part in assigned[1:]:
        out = out.unionAll(part)
    out = out.persist()
    out.count()
    for df in pinned:
        df.unpersist()
    return out


def bowtie(
    spark: SparkSession,
    engine: SuperstepEngine,
    edges: DataFrame,
    scc: DataFrame | None = None,
    run_id: str = "bowtie",
    max_supersteps: int = 200,
    num_parts: int | None = None,
) -> DataFrame:
    """Broder bowtie decomposition relative to the largest SCC
    (ties on size broken by smaller scc_id, so the map is
    deterministic): per vertex, ``cls`` ∈ {CORE, IN, OUT, OTHER}.

    - CORE — member of the largest SCC;
    - IN — reaches the core but is outside it;
    - OUT — reachable from the core but outside it;
    - OTHER — tendrils, tubes and disconnected mass (a vertex that
      both reached and were reached would be in the core itself).

    Two reachability floods from the core seed set (forward along the
    edges, backward along the reversed copy), each an ``engine.run``.
    ``scc`` may be passed to reuse a precomputed (vid, scc_id) map.
    """
    n_parts = num_parts or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if scc is None:
        scc = strongly_connected_components(
            spark, engine, edges, run_id=f"{run_id}/scc",
            max_supersteps=max_supersteps, num_parts=num_parts,
        )
    core_row = (
        scc.groupBy("scc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("scc_id"))
        .limit(1)
        .collect()
    )
    if not core_row:
        return scc.select("vid", F.lit("OTHER").alias("cls")).where(F.lit(False))
    core_id = core_row[0]["scc_id"]

    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(n_parts, "src")
        .persist()
    )
    rev = (
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        .repartition(n_parts, "src")
        .persist()
    )
    seeds = scc.select(
        "vid", (F.col("scc_id") == F.lit(core_id)).cast("int").alias("reached")
    )
    fwd_reach = _reach_flood(engine, seeds, e, f"{run_id}/fwd", max_supersteps)
    bwd_reach = _reach_flood(engine, seeds, rev, f"{run_id}/bwd", max_supersteps)

    out = (
        scc.join(
            fwd_reach.state.select("vid", F.col("reached").alias("from_core")),
            "vid",
        )
        .join(
            bwd_reach.state.select("vid", F.col("reached").alias("to_core")),
            "vid",
        )
        .select(
            "vid",
            F.when(F.col("scc_id") == F.lit(core_id), "CORE")
            .when(F.col("to_core") == 1, "IN")
            .when(F.col("from_core") == 1, "OUT")
            .otherwise("OTHER")
            .alias("cls"),
        )
        .persist()
    )
    out.count()
    e.unpersist()
    rev.unpersist()
    return out


def condensation_levels(
    spark: SparkSession,
    engine: SuperstepEngine,
    edges: DataFrame,
    run_id: str = "dag_levels",
    max_supersteps: int = 200,
) -> DataFrame:
    """Topological *depth* of every vertex in the condensation DAG:
    contract each SCC to one node (the condensation is acyclic by
    construction), then level(c) = length of the LONGEST path from any
    source component to c — the "how many dependency layers deep is
    this page cluster" analysis (crawl scheduling by layer, bowtie
    depth profiling; Broder et al. 2000 measure exactly these IN/OUT
    tendril depths). Sources sit at level 0.

    Computation: :func:`strongly_connected_components` labels, then a
    max-plus Bellman-Ford flood on the condensed edge table under the
    engine — level'(v) = max(level(v), max over in-edges level(u)+1),
    a fixpoint reached in (DAG depth) supersteps. Longest-path is
    NP-hard on general graphs but linear on DAGs, and the condensation
    is guaranteed acyclic, so the fixpoint is exact and deterministic
    (max-plus is order-free — hash-matches the DuckDB recursive-CTE
    twin).

    Plan shape per superstep: the |C|-row level table joins the
    condensed edge table on its existing src hash-partitioning, one
    partial-agg MAX by dst, one join-back — the katz/pagerank
    superstep shape on a graph that is usually orders of magnitude
    smaller than the input (the giant SCC is one node). Result is one
    row per ORIGINAL vertex: (vid, scc_id, level).
    """
    scc = strongly_connected_components(
        spark, engine, edges, run_id=f"{run_id}/scc",
        max_supersteps=max_supersteps,
    )
    lab_s = scc.select(F.col("vid").alias("src"), F.col("scc_id").alias("csrc"))
    lab_d = scc.select(F.col("vid").alias("dst"), F.col("scc_id").alias("cdst"))
    cond = (
        edges.select("src", "dst")
        .join(lab_s, "src")
        .join(lab_d, "dst")
        .where(F.col("csrc") != F.col("cdst"))
        .select(F.col("csrc").alias("src"), F.col("cdst").alias("dst"))
        .distinct()
        .persist()
    )
    cnodes = scc.select(F.col("scc_id").alias("vid")).distinct()

    def init() -> DataFrame:
        return cnodes.select(
            "vid", F.lit(0).cast("long").alias("level"),
            F.lit(1.0).alias("delta"),
        )

    def step(state: DataFrame, _k: int) -> DataFrame:
        best = (
            state.select(F.col("vid").alias("src"), "level")
            .join(cond, "src")
            .groupBy("dst")
            .agg((F.max("level") + F.lit(1)).alias("cand"))
        )
        return state.join(
            best, state["vid"] == best["dst"], "left"
        ).select(
            "vid",
            F.greatest(F.col("level"), F.coalesce("cand", F.lit(0)))
            .cast("long").alias("level"),
            (
                F.greatest(F.col("level"), F.coalesce("cand", F.lit(0)))
                - F.col("level")
            ).cast("double").alias("delta"),
        )

    res = engine.run(
        run_id, init, step, tol=0.0, max_supersteps=max_supersteps
    )
    out = (
        scc.join(
            res.state.select(F.col("vid").alias("scc_id"), "level"),
            "scc_id",
        )
        .select("vid", "scc_id", "level")
        .persist()
    )
    out.count()
    cond.unpersist()
    return out
