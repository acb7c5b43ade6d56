"""Maximal independent set — deterministic Luby rounds.

Not in the reference (its kernel surface is PR/CC/Sim), but MIS is the
classic symmetry-breaking primitive a link-graph engine needs for
distributed scheduling (crawl politeness sets, conflict-free update
batches) and for graph-coloring-style partition work.

Luby's algorithm with a *fixed content-hash priority* instead of a
per-round coin flip: vertex v joins the set when every still-undecided
neighbor has a higher (priority, id) pair, then v's neighbors drop
out. With a fixed priority this fixpoint is exactly the
lexicographically-first MIS under the hash order — a unique,
layout-independent result (the engine-wide determinism contract; same
md5 idiom as ops/sampling.py, SQL twin
``('0x' || substr(md5(...), 1, 15))::BIGINT``), while keeping Luby's
O(log n) expected round count because the hash order is
pseudo-random in the ids.

Scale shape: each round is two shuffles — a self-join of the
(still-undecided) edge list against the undecided-vertex state to find
blocked vertices, and a semi-join to drop winners' neighbors. The edge
table shrinks monotonically (both endpoints decided ⇒ edge gone), so
late rounds are cheap; state is persisted + localCheckpointed per
round so lineage stays flat. No driver data beyond per-round counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .kcore import symmetrize


def _priority(col) -> Column:
    """Deterministic pseudo-random priority: first 60 bits of md5."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def maximal_independent_set(
    edges: DataFrame,
    max_rounds: int = 64,
) -> DataFrame:
    """Lexicographically-first MIS by md5-hash priority over the
    undirected simple graph. Returns one column ``vid`` — the set
    members. The vertex universe is the endpoints of non-self-loop
    edges (an edge list cannot carry isolated vertices; a caller with
    a vertex table unions the isolated ids in afterward — they are
    always members).

    Deterministic: the result depends only on the vertex ids, never on
    partitioning or scheduling. Returns the unique fixpoint of:
    v ∈ MIS  ⇔  every neighbor u with (pri(u), u) < (pri(v), v) is
    ∉ MIS."""
    sym = symmetrize(edges)
    und = (
        sym.select(F.col("src").alias("vid"))
        .distinct()
        .select("vid", _priority(F.col("vid")).alias("pri"))
        .persist()
    )
    live = sym.persist()
    winners_acc: DataFrame | None = None
    rounds = 0
    while not und.isEmpty():
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"maximal_independent_set: not converged in {max_rounds} rounds"
            )
        # v is blocked iff some undecided neighbor has a smaller (pri, id)
        nbr = (
            live.join(und.select(F.col("vid").alias("dst"),
                                 F.col("pri").alias("dpri")), "dst")
            .join(und.select(F.col("vid").alias("src"),
                             F.col("pri").alias("spri")), "src")
        )
        blocked = nbr.where(
            (F.col("dpri") < F.col("spri"))
            | ((F.col("dpri") == F.col("spri")) & (F.col("dst") < F.col("src")))
        ).select(F.col("src").alias("vid")).distinct()
        win = und.join(blocked, "vid", "left_anti").select("vid")
        win = win.localCheckpoint(eager=True)
        winners_acc = win if winners_acc is None else winners_acc.unionAll(win)
        # drop winners and their neighbors from the undecided set
        lose = (
            live.join(win.withColumnRenamed("vid", "src"), "src")
            .select(F.col("dst").alias("vid"))
            .distinct()
        )
        nxt = (
            und.join(win, "vid", "left_anti")
            .join(lose, "vid", "left_anti")
            .localCheckpoint(eager=True)
        )
        und.unpersist()
        und = nxt
        # shrink the live edge list to undecided-undecided edges
        nlive = (
            live.join(und.select(F.col("vid").alias("src")), "src")
            .join(und.select(F.col("vid").alias("dst")), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        live.unpersist()
        live = nlive
    und.unpersist()
    live.unpersist()
    if winners_acc is None:  # empty graph
        return sym.select(F.col("src").alias("vid")).limit(0)
    return winners_acc.select("vid")
