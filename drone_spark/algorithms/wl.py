"""Weisfeiler–Lehman color refinement (1-WL) over the symmetrized
link graph.

The classic graph-fingerprinting iteration: every vertex's color is
re-hashed from (own color, sorted multiset of neighbor colors) each
round. After k rounds two vertices share a color iff their k-hop
neighborhood trees are isomorphic — the standard cheap structural
signature for graph dedup / isomorphism screening, and the feature map
of WL graph kernels (Shervashidze et al., JMLR 2011).

Spark shape: one equi-join (edges ⋈ colors) + one sorted-list
aggregation per round — identical superstep skeleton to the engine's
label propagation, so the plan reuses the same shuffle key (vertex id)
every round and AQE coalesces the tiny color table sides. The sorted
neighbor multiset is ``concat_ws(',', array_sort(collect_list(c)))``,
whose DuckDB twin is ``string_agg(c, ',' ORDER BY c)`` — identical
strings for hex colors, so md5 colors hash-match bit-for-bit.

The reference has no WL / isomorphism tier (its graph-simulation
operator is the closest relative — SimWorker.go matches pattern graphs
by attr + successor counts, not by structure hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def wl_refinement(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """k-round 1-WL colors on the symmetrized graph. Returns
    (vid, color) with color = hex md5 string; init color = md5 of the
    symmetric degree."""
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    colors = (
        sym.groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .select(
            F.col("src").alias("id"),
            F.md5(F.concat(F.lit("d:"), F.col("d").cast("string"))).alias("color"),
        )
    )
    # localCheckpoint per round (the engine's superstep discipline,
    # stress/onion convention): colors is referenced twice per round
    # (neighbor join + carry), so without truncation the lineage tree
    # doubles every round — 2^rounds plan growth at refinement depth
    for _ in range(rounds):
        colors = colors.localCheckpoint(eager=True)
        neigh = sym.join(colors, sym["dst"] == colors["id"]).select(
            sym["src"].alias("nid"), F.col("color").alias("nc")
        )
        sig = neigh.groupBy("nid").agg(
            F.concat_ws(",", F.array_sort(F.collect_list("nc"))).alias("ns")
        )
        colors = (
            colors.join(sig, colors["id"] == sig["nid"], "left")
            .select(
                "id",
                F.md5(
                    F.concat(
                        F.col("color"), F.lit(":"), F.coalesce("ns", F.lit(""))
                    )
                ).alias("color"),
            )
        )
    return colors.select(F.col("id").alias("vid"), "color")


def wl_refinement_sql(edges_cte: str, rounds: int = 3) -> str:
    """DuckDB twin — ``edges_cte`` must define ``edges(src, dst)``."""
    ctes = [
        edges_cte,
        "sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges)",
        "c0 AS (SELECT src AS id, md5('d:' || CAST(COUNT(*) AS VARCHAR)) AS color"
        " FROM sym GROUP BY src)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"n{r} AS (SELECT s.src AS id, string_agg(c.color, ',' ORDER BY c.color)"
            f" AS ns FROM sym s JOIN c{r-1} c ON s.dst = c.id GROUP BY s.src)"
        )
        ctes.append(
            f"c{r} AS (SELECT c.id, md5(c.color || ':' || COALESCE(n.ns, ''))"
            f" AS color FROM c{r-1} c LEFT JOIN n{r} n ON c.id = n.id)"
        )
    return (
        "WITH " + ", ".join(ctes) + f" SELECT id AS vid, color FROM c{rounds}"
    )
