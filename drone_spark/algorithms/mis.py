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


def maximal_matching(
    edges: DataFrame,
    rounds: int = 4,
) -> DataFrame:
    """Distributed matching by salted mutual proposals — the Israeli-
    Itai symmetry-breaking pattern, and THE coarsening primitive of
    multilevel graph partitioners (METIS collapses a maximal matching
    per level — the very preprocessing the reference consumes, SURVEY
    §2.2). Each round r, every unmatched vertex proposes to its
    unmatched neighbor with the smallest (md5(r‖u), u) pair; mutual
    proposals match, both endpoints retire. The per-round salt
    re-randomizes the priority order, so stalls like a path graph's
    one-pair-per-round min-ID pathology don't persist: a constant
    fraction of proposal chains close per round in expectation
    (Israeli & Itai 1986's analysis shape).

    ``rounds`` is a fixed prefix (the onion_layers/katz convention —
    kernels whose fixpoint depth is data-dependent run a deterministic
    bounded prefix for cross-engine exactness): the result is a valid
    (not necessarily maximal) matching after ``rounds`` rounds,
    identical in both engines; maximality is approached geometrically.

    Result: (a, b, round) with a < b — the matched pairs and the round
    that closed them.

    Scale shape per round: one semi-join to restrict the edge list to
    unmatched endpoints (the live edge set shrinks monotonically), one
    partial-agg MIN(struct) per vertex for the proposal, one self-join
    on the proposal table for mutuality — all hash joins on vertex
    keys; matched state is localCheckpointed per round (flat lineage,
    the onion_layers lesson).
    """
    sym = symmetrize(edges).persist()
    sym.count()
    spark = edges.sparkSession
    matched_pairs: list[DataFrame] = []
    matched_verts = spark.createDataFrame([], "vid long")
    live = sym
    for r in range(1, rounds + 1):
        if r > 1:
            live = (
                live.join(
                    matched_verts.withColumnRenamed("vid", "src"),
                    "src",
                    "left_anti",
                )
                .join(
                    matched_verts.withColumnRenamed("vid", "dst"),
                    "dst",
                    "left_anti",
                )
                .localCheckpoint()
            )
        pri = _priority(F.concat(F.lit(f"m{r}:"), F.col("dst").cast("string")))
        prop = (
            live.select("src", "dst", pri.alias("h"))
            .groupBy("src")
            .agg(F.min(F.struct("h", "dst")).alias("pick"))
            .select("src", F.col("pick.dst").alias("to"))
        )
        mutual = (
            prop.alias("x")
            .join(
                prop.alias("y"),
                (F.col("x.to") == F.col("y.src"))
                & (F.col("y.to") == F.col("x.src")),
            )
            .where(F.col("x.src") < F.col("x.to"))
            .select(
                F.col("x.src").alias("a"),
                F.col("x.to").alias("b"),
                F.lit(r).cast("long").alias("round"),
            )
            .localCheckpoint()
        )
        matched_pairs.append(mutual)
        matched_verts = (
            matched_verts.unionAll(mutual.select(F.col("a").alias("vid")))
            .unionAll(mutual.select(F.col("b").alias("vid")))
            .localCheckpoint()
        )
    sym.unpersist()
    res = matched_pairs[0]
    for part in matched_pairs[1:]:
        res = res.unionAll(part)
    return res


def maximal_matching_sql(edges_cte: str, rounds: int = 4) -> str:
    """DuckDB twin of :func:`maximal_matching`: unrolled round CTEs —
    per round a ROW_NUMBER proposal pick over the live edge set and a
    mutuality self-join, matched vertices accumulated by UNION."""
    ctes = [
        f"WITH {edges_cte}",
        "sym AS (SELECT src, dst FROM (SELECT src, dst FROM edges WHERE"
        " src <> dst UNION SELECT dst, src FROM edges WHERE src <> dst))",
        "mv0 AS (SELECT NULL::BIGINT AS vid WHERE FALSE)",
    ]
    pairs = []
    for r in range(1, rounds + 1):
        ctes.append(
            f"live{r} AS MATERIALIZED (SELECT s.src, s.dst FROM sym s"
            f" WHERE s.src NOT IN (SELECT vid FROM mv{r-1})"
            f" AND s.dst NOT IN (SELECT vid FROM mv{r-1}))"
        )
        ctes.append(
            f"prop{r} AS MATERIALIZED (SELECT src, dst AS t FROM ("
            f"SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src"
            f" ORDER BY ('0x' || substr(md5('m{r}:' ||"
            f" CAST(dst AS VARCHAR)), 1, 15))::BIGINT, dst) AS rn"
            f" FROM live{r}) WHERE rn = 1)"
        )
        ctes.append(
            f"mm{r} AS MATERIALIZED (SELECT x.src AS a, x.t AS b,"
            f" CAST({r} AS BIGINT) AS round FROM prop{r} x"
            f" JOIN prop{r} y ON x.t = y.src AND y.t = x.src"
            f" WHERE x.src < x.t)"
        )
        ctes.append(
            f"mv{r} AS MATERIALIZED (SELECT vid FROM mv{r-1} UNION ALL"
            f" SELECT a FROM mm{r} UNION ALL SELECT b FROM mm{r})"
        )
        pairs.append(f"SELECT a, b, round FROM mm{r}")
    return ", ".join(ctes) + " " + " UNION ALL ".join(pairs)
