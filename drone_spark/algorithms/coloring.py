"""Distributed graph coloring — iterated deterministic-Luby MIS.

The classic reduction (Luby 1986; Johansson's parallel greedy): color
round i assigns color i to a maximal independent set of the
still-uncolored residual graph, then removes it. Every round's MIS is
the deterministic hash-priority fixpoint from algorithms/mis.py, so
the whole coloring is unique and layout-independent — the engine-wide
determinism contract. Proper by construction (an MIS is independent);
round count ≤ the greedy bound (max residual degree + 1) and O(log²n)
expected under the hash order.

What a link-graph pipeline uses it for: conflict-free scheduling —
batches of vertices (hosts, shards) that can be updated/crawled
simultaneously because no two touch each other.

Scale shape per round: the MIS subroutine's two shuffles on the
(monotonically shrinking) residual edge list; the residual shrink is a
semi-join against the surviving vertex set. State persisted +
localCheckpointed per round, counts only on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .kcore import symmetrize
from .mis import maximal_independent_set


def greedy_coloring(edges: DataFrame, max_colors: int = 256) -> DataFrame:
    """(vid, color) over the endpoints of the undirected simple graph;
    colors are 0-based round indices of the iterated MIS peel."""
    live = symmetrize(edges).persist()
    out: DataFrame | None = None
    color = 0
    while not live.isEmpty():
        if color >= max_colors:
            raise RuntimeError(
                f"greedy_coloring: residual graph still non-empty after "
                f"{max_colors} colors"
            )
        mis = maximal_independent_set(live).localCheckpoint(eager=True)
        colored = mis.select("vid", F.lit(color).cast("long").alias("color"))
        out = colored if out is None else out.unionAll(colored)
        nxt = (
            live.join(mis.withColumnRenamed("vid", "src"), "src", "left_anti")
            .join(mis.withColumnRenamed("vid", "dst"), "dst", "left_anti")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        live.unpersist()
        live = nxt.persist()
        color += 1
    # the loop ends when the residual EDGE list is empty, so any
    # still-uncolored vertices are pairwise non-adjacent (an edge
    # between two uncolored endpoints would still be live) — they all
    # take the next color together
    live.unpersist()
    all_v = (
        symmetrize(edges)
        .select(F.col("src").alias("vid"))
        .distinct()
    )
    if out is None:
        return all_v.select("vid", F.lit(0).cast("long").alias("color"))
    rest = all_v.join(out.select("vid"), "vid", "left_anti").select(
        "vid", F.lit(color).cast("long").alias("color")
    )
    return out.unionAll(rest)
