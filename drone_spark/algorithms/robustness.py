"""Targeted-attack robustness — giant-component decay under hub
removal (Albert, Jeong & Barabási 2000). The classic webgraph
resilience curve: remove the ``budget`` highest-degree vertices, then
measure how the undirected graph fragments. Power-law link graphs
collapse fast under targeted attack (and barely notice random failure)
— the structural fact that drives crawler frontier diversity and
mirror placement.

Result: one row per budget — (budget, n_vertices, n_components,
giant_size) over the surviving subgraph.

Scale shape: the degree ranking is one agg + TakeOrderedAndProject
(top-budget rows only, broadcast back as an anti-join — never a global
sort); each budget then runs the engine's distributed frontier CC on
the filtered graph. Budgets are a handful, so this is O(|budgets|) CC
runs — each the same plan the cc oracle already pins; no driver-side
graph state beyond the ≤max(budget) removed-vertex list.

Determinism: ties in the degree ranking break on vertex id (desc deg,
asc id) — the md5/orderBy convention everywhere else in the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine.superstep import SuperstepEngine
from .cc import _sym_edges, connected_components


def attack_robustness(
    spark: SparkSession,
    engine: SuperstepEngine,
    edges: DataFrame,
    budgets: tuple[int, ...] = (0, 5, 20),
    run_id: str = "robustness",
) -> DataFrame:
    sym = _sym_edges(edges)
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    max_b = max(budgets)
    # driver-side list of AT MOST max(budgets) hub ids (int or string
    # vertex keys) — a scalar-sized collect (the IVF-init convention),
    # then broadcast isin filters
    hubs = [
        r["id"] for r in deg.orderBy(F.desc("deg"), "id").limit(max_b).collect()
    ]
    rows = []
    for b in sorted(budgets):
        removed = set(hubs[:b])
        if removed:
            keep = ~F.col("src").isin(removed) & ~F.col("dst").isin(removed)
            sub = edges.where(keep)
        else:
            sub = edges
        res = connected_components(
            spark, engine, sub, run_id=f"{run_id}_b{b}", backend="relational"
        )
        comp_sizes = res.state.groupBy("label").agg(
            F.count(F.lit(1)).alias("n")
        )
        agg = comp_sizes.agg(
            F.sum("n").alias("nv"),
            F.count(F.lit(1)).alias("nc"),
            F.max("n").alias("giant"),
        ).collect()[0]
        rows.append(
            (b, int(agg["nv"] or 0), int(agg["nc"] or 0), int(agg["giant"] or 0))
        )
    return spark.createDataFrame(
        rows, "budget long, n_vertices long, n_components long, giant_size long"
    )


def attack_robustness_sql(
    edges_cte: str, budgets: tuple[int, ...] = (0, 5, 20)
) -> str:
    """DuckDB twin of :func:`attack_robustness`: per budget, a
    recursive hash-to-min CC over the hub-filtered symmetric graph
    (the connected_components oracle pattern), UNION ALL'd."""
    parts = []
    for b in sorted(budgets):
        parts.append(
            f"(WITH RECURSIVE hubs AS (SELECT id FROM bdeg"
            f" ORDER BY deg DESC, id LIMIT {b}), "
            "fsym AS (SELECT s.src, s.dst FROM bsym s"
            " WHERE s.src NOT IN (SELECT id FROM hubs)"
            " AND s.dst NOT IN (SELECT id FROM hubs)), "
            "fv AS (SELECT DISTINCT src AS id FROM fsym), "
            "walk(id, lab) AS ("
            " SELECT id, id FROM fv"
            " UNION"
            " SELECT s.dst, w.lab FROM walk w JOIN fsym s ON s.src = w.id"
            " WHERE w.lab < s.dst), "
            "comp AS (SELECT id, MIN(lab) AS label FROM walk GROUP BY id), "
            "sizes AS (SELECT label, COUNT(*) AS n FROM comp GROUP BY label) "
            f"SELECT CAST({b} AS BIGINT) AS budget,"
            " CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_vertices,"
            " CAST(COUNT(*) AS BIGINT) AS n_components,"
            " CAST(COALESCE(MAX(n), 0) AS BIGINT) AS giant_size FROM sizes)"
        )
    return (
        f"WITH {edges_cte}, "
        "bsym AS (SELECT src, dst FROM (SELECT src, dst FROM edges WHERE"
        " src <> dst UNION SELECT dst, src FROM edges WHERE src <> dst)), "
        "bdeg AS (SELECT src AS id, COUNT(*) AS deg FROM bsym GROUP BY src) "
        + " UNION ALL ".join(parts)
    )
