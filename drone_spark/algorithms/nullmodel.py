"""Degree-preserving null models — the baseline a structural metric is
judged against ("is this triangle count more than chance for these
degrees?"). Deterministic configuration-model rewiring: stubs paired in
md5 order, so the null graph is a pure function of (graph, salt) —
re-derivable on any layout, any engine, any re-run (the engine's
standing determinism convention; a seeded RNG would be neither
layout-independent nor oracle-checkable)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .cc import _sym_edges


def configuration_rewire(edges: DataFrame, salt: str = "cm0") -> DataFrame:
    """Configuration-model rewiring (Molloy-Reed): each vertex
    contributes deg(v) stubs; stubs sort by md5(salt, vid, i) and
    consecutive pairs (rank 2j, 2j+1) become edges. Returns the simple
    undirected null graph as canonical (src < dst) distinct edges
    (self-loops and multi-edges dropped — the standard simple-graph
    approximation; both are O(1/n) of stubs for realistic degree
    sequences).

    Degree sequence comes from the symmetrized simple input graph, so
    Σdeg is even and every stub pairs.

    Scale shape — pairing needs each stub's GLOBAL rank in md5 order,
    and a bare ``row_number() OVER (ORDER BY pri)`` collapses to one
    task (the same "no partition defined" scale bug budget_sample
    avoids). Same fix: the first two hex chars of the md5 split the
    order into 256 contiguous ranges; ranks are computed per bucket in
    parallel and shifted by the 256-row bucket-count prefix offsets (a
    scalar-metrics-sized collect). Bit-identical to the global sort
    because the bucket is a PREFIX of the priority."""
    sym = _sym_edges(edges)
    deg = sym.groupBy(F.col("src").alias("vid")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    pri = F.md5(F.concat_ws(":", F.lit(salt), F.col("vid"), F.col("i")))
    stubs = deg.select(
        "vid", F.explode(F.sequence(F.lit(1), F.col("deg"))).alias("i")
    ).select("vid", "i", pri.alias("pri"), F.substring(pri, 1, 2).alias("bucket"))
    totals = {
        r["bucket"]: r["n"]
        for r in stubs.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, running = {}, 0
    for b in sorted(totals):
        offsets[b] = running
        running += totals[b]
    if not offsets:
        return sym.limit(0).select("src", "dst")
    off = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("bucket").orderBy("pri", "vid", "i")
    ranked = stubs.select(
        "vid",
        (F.row_number().over(w) + off[F.col("bucket")] - 1).alias("rank"),
    )
    paired = (
        ranked.select(
            "vid",
            F.floor(F.col("rank") / 2).alias("pair_id"),
            (F.col("rank") % 2).alias("side"),
        )
        .groupBy("pair_id")
        .agg(
            F.min(F.when(F.col("side") == 0, F.col("vid"))).alias("a"),
            F.min(F.when(F.col("side") == 1, F.col("vid"))).alias("b"),
        )
    )
    return (
        paired.where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst")
        )
        .distinct()
    )


def configuration_rewire_sql(
    edges_cte: str, salt: str = "cm0", final_cte: str | None = None
) -> str:
    """DuckDB twin of :func:`configuration_rewire` (single global
    ROW_NUMBER — exactly the ordering the bucketed ranks reproduce).
    ``edges_cte`` must define ``gedges(src, dst)``. With ``final_cte``
    the rewired edge set is emitted as a named CTE (no final SELECT),
    for composition into larger twins."""
    final = (
        "SELECT DISTINCT LEAST(a, b) AS src, GREATEST(a, b) AS dst "
        "FROM paired WHERE a <> b"
    )
    tail = (
        f"), {final_cte} AS ({final})" if final_cte is not None
        else ") " + final
    )
    return (
        f"{edges_cte}, "
        "symn AS (SELECT src, dst FROM gedges WHERE src <> dst "
        "UNION SELECT dst, src FROM gedges WHERE src <> dst), "
        "degn AS (SELECT src AS vid, COUNT(*) AS deg FROM symn GROUP BY src), "
        "stubs AS (SELECT vid, i, "
        f"md5('{salt}' || ':' || vid || ':' || i) AS pri "
        "FROM (SELECT vid, UNNEST(generate_series(1, deg::INT)) AS i FROM degn)), "
        "ranked AS (SELECT vid, ROW_NUMBER() OVER (ORDER BY pri, vid, i) - 1 "
        "AS rank FROM stubs), "
        "paired AS (SELECT MIN(CASE WHEN rank % 2 = 0 THEN vid END) AS a, "
        "MIN(CASE WHEN rank % 2 = 1 THEN vid END) AS b "
        "FROM ranked GROUP BY rank // 2"
        + tail
    )
