"""Seeded majority label spreading — semi-supervised classification
over a similarity/link graph: a few labeled vertices (seeds) vote their
labels onto neighbors, synchronously, for a fixed round count. The
webtext use: propagate known page categories / languages / spam
verdicts across the near-dup or hyperlink graph to unlabeled pages.

Distinct from `label_propagation` (cc.py): that op finds communities
(every vertex starts labeled with itself, hash-to-min); this op
CLASSIFIES against a clamped seed set — seeds never change, unlabeled
vertices adopt the majority label of their labeled neighbors, ties
break to the smallest label so every round is deterministic and
layout-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .cc import _sym_edges


def label_spread(
    edges: DataFrame, seeds: DataFrame, rounds: int = 2
) -> DataFrame:
    """Synchronous seeded majority spreading for ``rounds`` rounds →
    (vid, label) for EVERY vertex of the symmetrized simple graph;
    label is null where no labeled vertex is within ``rounds`` hops.

    Per round, every NON-SEED vertex (labeled or not — earlier guesses
    may flip as better-labeled neighborhoods emerge) takes
    argmax_label Σ_{labeled nbrs} 1, ties to the smallest label;
    seeds are clamped. ``seeds``: (vid, label), integer labels.

    Plan per round: one edge⋈state join + one partial-agg count per
    (vid, label) + one max_by argmax — the same one-shuffle superstep
    shape as the PageRank scatter; state is |V| rows, label column
    only. No Python, no collect."""
    sym = _sym_edges(edges)
    verts = sym.select(F.col("src").alias("vid")).distinct()
    seed = seeds.select("vid", F.col("label").cast("long").alias("seed_label"))
    state = verts.join(seed, "vid", "left").select(
        "vid",
        F.col("seed_label"),
        F.col("seed_label").alias("label"),
    )
    for _ in range(rounds):
        votes = (
            sym.join(
                state.where(F.col("label").isNotNull()).select(
                    F.col("vid").alias("dst"), F.col("label").alias("nl")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("vid"), F.col("nl"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        best = votes.groupBy("vid").agg(
            F.max_by(F.col("nl"), F.struct(F.col("n"), -F.col("nl"))).alias("maj")
        )
        state = (
            state.join(best, "vid", "left")
            .select(
                "vid",
                "seed_label",
                F.coalesce("seed_label", "maj", "label").alias("label"),
            )
        )
    return state.select("vid", "label")


def label_spread_sql(
    edges_cte: str, seeds_cte: str, rounds: int = 2
) -> str:
    """DuckDB twin of :func:`label_spread`. ``edges_cte`` defines
    ``gedges(src, dst)``; ``seeds_cte`` defines ``seeds(vid, label)``."""
    ctes = [
        edges_cte,
        seeds_cte,
        "symn AS (SELECT src, dst FROM gedges WHERE src <> dst "
        "UNION SELECT dst, src FROM gedges WHERE src <> dst), "
        "verts AS (SELECT DISTINCT src AS vid FROM symn), "
        "s0 AS (SELECT v.vid, s.label AS seed_label, "
        "CAST(s.label AS BIGINT) AS label "
        "FROM verts v LEFT JOIN seeds s ON s.vid = v.vid)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"v{r} AS (SELECT e.src AS vid, p.label AS nl, COUNT(*) AS n "
            f"FROM symn e JOIN s{r-1} p ON p.vid = e.dst "
            "WHERE p.label IS NOT NULL GROUP BY e.src, p.label), "
            f"b{r} AS (SELECT vid, nl AS maj FROM (SELECT vid, nl, "
            "ROW_NUMBER() OVER (PARTITION BY vid ORDER BY n DESC, nl) AS rn "
            f"FROM v{r}) WHERE rn = 1), "
            f"s{r} AS (SELECT p.vid, p.seed_label, "
            "CAST(COALESCE(p.seed_label, b.maj, p.label) AS BIGINT) AS label "
            f"FROM s{r-1} p LEFT JOIN b{r} b ON b.vid = p.vid)"
        )
    # no leading WITH: callers compose this into larger CTE chains
    # (same contract as nullmodel.configuration_rewire_sql)
    return ", ".join(ctes) + f" SELECT vid, label FROM s{rounds}"
