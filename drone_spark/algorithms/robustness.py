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


def bond_percolation(
    spark: SparkSession,
    engine: SuperstepEngine,
    edges: DataFrame,
    keep_ppms: tuple[int, ...] = (250_000, 500_000, 750_000),
    salt: str = "perc",
    run_id: str = "bond_perc",
) -> DataFrame:
    """Bond (edge) percolation — the random-FAILURE complement of
    :func:`attack_robustness` (Albert et al. 2000 measure both): keep
    each edge independently with probability p and measure the giant
    component. Scale-free link graphs keep a giant component down to
    tiny p (robust to random failure) while collapsing under targeted
    attack — this pair of curves IS that classic contrast.

    Edge survival is the engine's deterministic md5 idiom (uniform in
    [0, 1e6) from md5(salt:src:dst), the stratified_sample /
    weighted_sample convention), so the 'random' draw is reproducible
    bit-for-bit in both engines and across cluster layouts. Each
    keep-rate runs the distributed frontier CC on the filtered edge
    set — |keep_ppms| CC runs, no driver-side graph state.

    Result: one row per keep_ppm — (keep_ppm, n_edges_kept,
    n_vertices, n_components, giant_size); vertices = endpoints of
    kept edges (fully isolated vertices drop, as in the attack
    curve)."""
    und = edges.where(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(salt + ":"),
                    F.col("a").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long") % 1_000_000
    scored = und.withColumn("u", h)
    out = None
    for ppm in keep_ppms:
        kept = scored.where(F.col("u") < ppm).select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        )
        n_kept = kept.count()
        if n_kept == 0:
            row = spark.createDataFrame(
                [(ppm, 0, 0, 0, 0)],
                "keep_ppm long, n_edges_kept long, n_vertices long,"
                " n_components long, giant_size long",
            )
        else:
            res = connected_components(
                spark, engine, kept, run_id=f"{run_id}_{ppm}",
                backend="relational",
            )
            comp = res.state.groupBy("label").agg(
                F.count(F.lit(1)).alias("sz")
            )
            row = comp.agg(
                F.lit(ppm).cast("long").alias("keep_ppm"),
                F.lit(n_kept).cast("long").alias("n_edges_kept"),
                F.sum("sz").cast("long").alias("n_vertices"),
                F.count(F.lit(1)).cast("long").alias("n_components"),
                F.max("sz").cast("long").alias("giant_size"),
            )
        out = row if out is None else out.unionAll(row)
    return out


def bond_percolation_sql(
    edges_cte: str,
    keep_ppms: tuple[int, ...] = (250_000, 500_000, 750_000),
    salt: str = "perc",
) -> str:
    """DuckDB twin of :func:`bond_percolation` (same md5 survival
    draw, recursive min-label walk per keep rate)."""
    parts = [
        f"WITH RECURSIVE {edges_cte}, "
        "und AS (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM edges WHERE src <> dst), "
        "scored AS (SELECT a, b, "
        f"CAST(('0x' || substr(md5('{salt}:' || CAST(a AS VARCHAR) || ':' || "
        "CAST(b AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 AS u FROM und)"
    ]
    sels = []
    for ppm in keep_ppms:
        parts.append(
            f"k{ppm} AS (SELECT a, b FROM scored WHERE u < {ppm})"
        )
        parts.append(
            f"s{ppm} AS (SELECT a AS s, b AS d FROM k{ppm} "
            f"UNION SELECT b, a FROM k{ppm})"
        )
        parts.append(f"v{ppm} AS (SELECT DISTINCT s AS id FROM s{ppm})")
        parts.append(
            f"w{ppm}(id, lab) AS ("
            f" SELECT id, id FROM v{ppm}"
            f" UNION"
            f" SELECT s.d, w.lab FROM w{ppm} w JOIN s{ppm} s ON s.s = w.id"
            f" WHERE w.lab < s.d)"
        )
        parts.append(
            f"c{ppm} AS (SELECT id, MIN(lab) AS comp FROM w{ppm} GROUP BY id)"
        )
        sels.append(
            f"SELECT CAST({ppm} AS BIGINT) AS keep_ppm, "
            f"CAST((SELECT COUNT(*) FROM k{ppm}) AS BIGINT) AS n_edges_kept, "
            f"CAST(COUNT(*) AS BIGINT) AS n_vertices, "
            f"CAST(COUNT(DISTINCT comp) AS BIGINT) AS n_components, "
            f"CAST(COALESCE(MAX(cnt), 0) AS BIGINT) AS giant_size FROM "
            f"(SELECT comp, COUNT(*) OVER (PARTITION BY comp) AS cnt "
            f"FROM c{ppm})"
        )
    return ", ".join(parts) + " " + " UNION ALL ".join(sels)


def site_percolation(
    spark: SparkSession,
    engine: SuperstepEngine,
    edges: DataFrame,
    keep_ppms: tuple[int, ...] = (250_000, 500_000, 750_000),
    salt: str = "site",
    run_id: str = "site_perc",
) -> DataFrame:
    """Site (vertex) percolation — the third panel of the resilience
    triptych (targeted attack / bond failure / site failure, Albert et
    al. 2000; Callaway et al. 2000): keep each VERTEX with probability
    p via the deterministic md5 draw, keep edges with both endpoints
    alive, measure the giant component. Site curves sit below bond
    curves at equal p (removing a hub removes all its edges at once) —
    the gap is itself a hub-dependence diagnostic.

    Same md5/CC machinery as :func:`bond_percolation`; the draw keys
    on the vertex id alone so both endpoints' survival is independent
    and layout-free. Result per keep_ppm: (keep_ppm, n_vertices_kept,
    n_edges_kept, n_components, giant_size) — vertices counted over
    kept-edge endpoints (isolated survivors drop, as everywhere in the
    robustness family)."""
    und = edges.where(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()

    def draw(col):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), F.col(col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long") % 1_000_000

    scored = und.withColumn("ua", draw("a")).withColumn("ub", draw("b"))
    out = None
    for ppm in keep_ppms:
        kept = scored.where(
            (F.col("ua") < ppm) & (F.col("ub") < ppm)
        ).select(F.col("a").alias("src"), F.col("b").alias("dst"))
        n_kept = kept.count()
        if n_kept == 0:
            row = spark.createDataFrame(
                [(ppm, 0, 0, 0, 0)],
                "keep_ppm long, n_vertices_kept long, n_edges_kept long,"
                " n_components long, giant_size long",
            )
        else:
            res = connected_components(
                spark, engine, kept, run_id=f"{run_id}_{ppm}",
                backend="relational",
            )
            comp = res.state.groupBy("label").agg(
                F.count(F.lit(1)).alias("sz")
            )
            row = comp.agg(
                F.lit(ppm).cast("long").alias("keep_ppm"),
                F.sum("sz").cast("long").alias("n_vertices_kept"),
                F.lit(n_kept).cast("long").alias("n_edges_kept"),
                F.count(F.lit(1)).cast("long").alias("n_components"),
                F.max("sz").cast("long").alias("giant_size"),
            )
        out = row if out is None else out.unionAll(row)
    return out


def site_percolation_sql(
    edges_cte: str,
    keep_ppms: tuple[int, ...] = (250_000, 500_000, 750_000),
    salt: str = "site",
) -> str:
    """DuckDB twin of :func:`site_percolation`."""
    u = (
        f"CAST(('0x' || substr(md5('{salt}:' || CAST({{c}} AS VARCHAR)), 1, 15))"
        " AS BIGINT) % 1000000"
    )
    parts = [
        f"WITH RECURSIVE {edges_cte}, "
        "und AS (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM edges WHERE src <> dst), "
        f"scored AS (SELECT a, b, {u.format(c='a')} AS ua, "
        f"{u.format(c='b')} AS ub FROM und)"
    ]
    sels = []
    for ppm in keep_ppms:
        parts.append(
            f"k{ppm} AS (SELECT a, b FROM scored WHERE ua < {ppm} "
            f"AND ub < {ppm})"
        )
        parts.append(
            f"s{ppm} AS (SELECT a AS s, b AS d FROM k{ppm} "
            f"UNION SELECT b, a FROM k{ppm})"
        )
        parts.append(f"v{ppm} AS (SELECT DISTINCT s AS id FROM s{ppm})")
        parts.append(
            f"w{ppm}(id, lab) AS ("
            f" SELECT id, id FROM v{ppm}"
            f" UNION"
            f" SELECT s.d, w.lab FROM w{ppm} w JOIN s{ppm} s ON s.s = w.id"
            f" WHERE w.lab < s.d)"
        )
        parts.append(
            f"c{ppm} AS (SELECT id, MIN(lab) AS comp FROM w{ppm} GROUP BY id)"
        )
        sels.append(
            f"SELECT CAST({ppm} AS BIGINT) AS keep_ppm, "
            f"CAST(COUNT(*) AS BIGINT) AS n_vertices_kept, "
            f"CAST((SELECT COUNT(*) FROM k{ppm}) AS BIGINT) AS n_edges_kept, "
            f"CAST(COUNT(DISTINCT comp) AS BIGINT) AS n_components, "
            f"CAST(COALESCE(MAX(cnt), 0) AS BIGINT) AS giant_size FROM "
            f"(SELECT comp, COUNT(*) OVER (PARTITION BY comp) AS cnt "
            f"FROM c{ppm})"
        )
    return ", ".join(parts) + " " + " UNION ALL ".join(sels)
