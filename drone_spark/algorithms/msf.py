"""Minimum spanning forest — distributed Borůvka.

The classic log-round distributed MSF (Borůvka 1926; the canonical
Pregel/GraphX demonstration algorithm): every component picks its
lightest incident cut edge, all picked edges join the forest at once,
components contract, repeat. Rounds ≤ ⌈log₂ V⌉ because every component
merges with at least one neighbor per round.

The reference engine has no MSF; this op extends the link-graph tier
the same way k-truss/MIS/coloring did — spanning structure is the
backbone-extraction primitive for web-graph visualization, hierarchical
clustering (single-linkage = MSF), and network-cost planning.

Correctness contract: edges are totally ordered by the lexicographic
key ``(w, u, v)`` (canonical ``u < v``), so the MSF is UNIQUE even with
duplicate weights — the cut property applies to the induced strict
order. Parallel edges collapse to their minimal key up front.

Scale shape (the 100 TB audit):

- per round, the O(E) work is two broadcast-free equi-joins
  (edge-endpoint → component relabel) and one map-side-combining
  ``groupBy(comp).min(struct)`` — no collect of anything O(V) or O(E);
- the contraction pointer graph has ≤ #components rows; 2-cycles are
  broken by a self-join, then **pointer doubling** (parent ←
  parent∘parent) finds tree roots in O(log height) tiny self-joins —
  never a diameter-bound label flood;
- every round's state (component map, forest) is
  ``localCheckpoint(eager=True)``-ed, the engine's superstep lineage
  discipline, so nested-loop plans never stack.

Driver traffic: per-round scalar counts only (the loop conditions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canonical_edges(
    edges: DataFrame, src: str, dst: str, weight_col: str
) -> DataFrame:
    """(u, v, w) with u < v, self-loops dropped, parallel edges
    collapsed to the minimal (w, u, v) key — one partial-agg groupBy."""
    u = F.least(F.col(src), F.col(dst)).alias("u")
    v = F.greatest(F.col(src), F.col(dst)).alias("v")
    return (
        edges.where(F.col(src) != F.col(dst))
        .select(u, v, F.col(weight_col).cast("double").alias("w"))
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
    )


def minimum_spanning_forest(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str = "w",
    max_rounds: int = 64,
) -> DataFrame:
    """MSF of the undirected graph → DataFrame (u, v, w), u < v: the
    unique spanning forest under the (w, u, v) total order. Exactly
    V − #components rows."""
    e = _canonical_edges(edges, src, dst, weight_col).persist()
    comp = (
        e.select(F.col("u").alias("id"))
        .unionAll(e.select(F.col("v").alias("id")))
        .distinct()
        .select("id", F.col("id").alias("comp"))
        .localCheckpoint(eager=True)
    )
    forest: DataFrame | None = None

    for _ in range(max_rounds):
        # relabel endpoints by current component
        cu = comp.select(F.col("id").alias("u"), F.col("comp").alias("cu"))
        cv = comp.select(F.col("id").alias("v"), F.col("comp").alias("cv"))
        ce = (
            e.join(cu, "u")
            .join(cv, "v")
            .where(F.col("cu") != F.col("cv"))
            .localCheckpoint(eager=True)
        )
        if ce.isEmpty():
            break

        # each component's lightest incident cut edge, (w, u, v) order
        pick = F.struct("w", "u", "v", "cu", "cv").alias("pick")
        inc = ce.select(F.col("cu").alias("c"), pick).unionAll(
            ce.select(F.col("cv").alias("c"), pick)
        )
        sel = inc.groupBy("c").agg(F.min("pick").alias("pick")).persist()

        chosen = sel.select(
            F.col("pick.u").alias("u"),
            F.col("pick.v").alias("v"),
            F.col("pick.w").alias("w"),
        ).dropDuplicates(["u", "v"])
        forest = (
            chosen if forest is None else forest.unionAll(chosen)
        ).localCheckpoint(eager=True)

        # pointer graph: component -> the other endpoint's component
        ptr = sel.select(
            "c",
            F.when(F.col("pick.cu") == F.col("c"), F.col("pick.cv"))
            .otherwise(F.col("pick.cu"))
            .alias("p"),
        )
        # break mutual pairs (both comps picked the same lightest edge):
        # the smaller id becomes the root of the merged tree. back.p is
        # unique (one ptr row per c), so the left join cannot fan out.
        back = ptr.select(F.col("c").alias("p"), F.col("p").alias("bp"))
        ptr = (
            ptr.join(back, "p", "left")
            .select(
                "c",
                F.when(
                    (F.col("bp") == F.col("c")) & (F.col("p") > F.col("c")),
                    F.col("c"),
                )
                .otherwise(F.col("p"))
                .alias("p"),
            )
            .localCheckpoint(eager=True)
        )
        sel.unpersist()

        # pointer doubling to the root
        while True:
            hop = ptr.select(F.col("p").alias("c2"), F.col("c"))
            ptr2 = (
                hop.join(
                    ptr.select(F.col("c").alias("c2"), F.col("p")), "c2"
                )
                .select("c", "p")
                .localCheckpoint(eager=True)
            )
            n_moved = (
                ptr2.join(ptr.select("c", F.col("p").alias("p0")), "c")
                .where(F.col("p") != F.col("p0"))
                .count()
            )
            ptr = ptr2
            if n_moved == 0:
                break

        comp = (
            comp.join(ptr.select(F.col("c").alias("comp"), "p"), "comp", "left")
            .select("id", F.coalesce("p", "comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(f"Borůvka did not terminate in {max_rounds} rounds")

    e.unpersist()
    if forest is None:
        return e.select("u", "v", "w").limit(0)
    return forest
