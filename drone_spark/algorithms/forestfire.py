"""Deterministic forest-fire graph sampling (Leskovec & Faloutsos,
KDD 2006) over the symmetrized link graph.

The classic way to cut a representative subgraph out of a web-scale
graph (for algorithm prototyping, visualization, or train/test graph
splits): start fires at seed vertices and burn outward, each edge
igniting with probability p. Here the coin is the parity bit of the
portable 60-bit md5 of (round, src, dst) — so the sample is exactly
reproducible (lineage-friendly, like every sampler in this repo) and
the DuckDB twin replays it bit-for-bit.

Scale shape: each round is one frontier⋈edges equi-join + anti-join
against the burned set — the same delta-frontier discipline as the CC/
SSSP kernels (SURVEY §2.2 F3); no per-vertex Python, no driver-side
state beyond the loop counter. Burn probability 1/2 per directed
traversal; rounds bound the burn depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _coin(salt: str):
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt),
                        F.col("src").cast("string"),
                        F.lit(":"),
                        F.col("dst").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .bitwiseAND(1)
        == 0
    )


def forest_fire(
    edges: DataFrame, rounds: int = 3, seed_mod: int = 977
) -> DataFrame:
    """Burn ``rounds`` waves from seeds {v : v % seed_mod == 0} over
    the symmetrized graph. Returns (round, n_new, n_total) — the
    burn-growth curve; the burned set itself stays distributed."""
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    burned = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .where(F.col("id") % seed_mod == 0)
        .withColumn("round", F.lit(0))
    )
    for r in range(1, rounds + 1):
        frontier = burned.where(F.col("round") == r - 1).select(
            F.col("id").alias("fid")
        )
        newly = (
            sym.join(frontier, sym["src"] == frontier["fid"])
            .where(_coin(f"ff{r}:"))
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(burned.select("id"), "id", "left_anti")
            .withColumn("round", F.lit(r))
        )
        burned = burned.unionAll(newly)
    counts = burned.groupBy("round").agg(F.count(F.lit(1)).alias("n_new"))
    # a wave can burn nothing — emit its 0 row like the SQL twin does
    rng = edges.sparkSession.range(rounds + 1).select(
        F.col("id").cast("int").alias("round")
    )
    growth = rng.join(counts, "round", "left").select(
        "round", F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new")
    )
    w = Window.orderBy("round").rowsBetween(Window.unboundedPreceding, 0)
    return growth.select(
        "round", "n_new", F.sum("n_new").over(w).cast("long").alias("n_total")
    )


def forest_fire_sql(
    edges_cte: str, rounds: int = 3, seed_mod: int = 977
) -> str:
    """DuckDB twin — ``edges_cte`` must define ``edges(src, dst)``."""

    def coin(salt: str, src: str = "s.src", dst: str = "s.dst") -> str:
        return (
            f"(('0x' || substr(md5('{salt}' || CAST({src} AS VARCHAR) || ':' || "
            f"CAST({dst} AS VARCHAR)), 1, 15))::BIGINT & 1) = 0"
        )

    ctes = [
        edges_cte,
        "sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges)",
        f"b0 AS (SELECT DISTINCT src AS id FROM sym WHERE src % {seed_mod} = 0)",
        "n0 AS (SELECT id FROM b0)",
        "t0 AS (SELECT id FROM b0)",
    ]
    for r in range(1, rounds + 1):
        # fire spreads from the NEWEST wave only (n{r-1}), but may not
        # re-burn anything already in the cumulative set t{r-1}
        ctes.append(
            f"n{r} AS (SELECT DISTINCT s.dst AS id FROM sym s "
            f"JOIN n{r-1} t ON s.src = t.id WHERE {coin(f'ff{r}:')} "
            f"AND s.dst NOT IN (SELECT id FROM t{r-1}))"
        )
        ctes.append(
            f"t{r} AS (SELECT id FROM t{r-1} UNION SELECT id FROM n{r})"
        )
    rows = ["SELECT 0 AS round, COUNT(*) AS n_new FROM b0"] + [
        f"SELECT {r} AS round, COUNT(*) AS n_new FROM n{r}"
        for r in range(1, rounds + 1)
    ]
    return (
        "WITH " + ", ".join(ctes) + ", "
        "growth AS (" + " UNION ALL ".join(rows) + ") "
        "SELECT round, CAST(n_new AS BIGINT) AS n_new, "
        "CAST(SUM(n_new) OVER (ORDER BY round) AS BIGINT) AS n_total "
        "FROM growth"
    )
