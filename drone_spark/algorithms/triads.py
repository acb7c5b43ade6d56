"""Directed dyad + triad census over the host graph.

The social-network-analysis classics the reference's undirected
triangle tier (SURVEY §2.9) cannot answer: how many host pairs link
*mutually* vs one-way, and of the directed triangles, how many are
feed-forward (transitive — a→b, b→c, a→c, the web's hierarchy motif)
vs feedback (cyclic — a→b, b→c, c→a, the rare spam-ring motif). The
transitive:cyclic ratio is a standard webgraph health signal.

Plan shape: everything is equi-joins on the deduped, self-loop-free
edge table. The two triangle counts are edge⋈edge⋈edge path closures —
the same degree-bounded self-join family as triangles.py, so at 100 TB
the same hot-vertex cap / degree-ordering applies (host graphs are
~5 orders smaller than page graphs, so the host census is cheap even
uncapped). Cycles are counted once via the unique min-rooted rotation
(a < b and a < c); transitive triples are counted per ordered
occurrence, matching the standard census convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def triad_census(edges: DataFrame) -> DataFrame:
    """Returns 4 rows: (pattern, cnt) for mutual_dyads, asym_dyads,
    transitive_triads, cyclic_triads."""
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .cache()
    )
    pairs = e.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    mutual = (
        e.alias("x")
        .join(
            e.alias("y"),
            (F.col("x.src") == F.col("y.dst"))
            & (F.col("x.dst") == F.col("y.src"))
            & (F.col("x.src") < F.col("x.dst")),
        )
        .count()
    )
    n_pairs = pairs.count()
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    trans = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .where(F.col("e1.src") != F.col("e2.dst"))
        .count()
    )
    cyc = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e2.dst"))
            & (F.col("e3.dst") == F.col("e1.src")),
        )
        .where(
            (F.col("e1.src") < F.col("e1.dst"))
            & (F.col("e1.src") < F.col("e2.dst"))
        )
        .count()
    )
    spark = edges.sparkSession
    rows = [
        ("mutual_dyads", mutual),
        ("asym_dyads", n_pairs - mutual),
        ("transitive_triads", trans),
        ("cyclic_triads", cyc),
    ]
    return spark.createDataFrame(rows, "pattern string, cnt long")


def triad_census_sql(edges_cte: str) -> str:
    """DuckDB twin — ``edges_cte`` must define ``edges(src, dst)``
    (dedup/self-loop handling is re-applied here)."""
    return (
        f"WITH {edges_cte}, "
        "e AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst), "
        "mutual AS (SELECT COUNT(*) AS m FROM e x JOIN e y "
        "ON x.src = y.dst AND x.dst = y.src AND x.src < x.dst), "
        "pairs AS (SELECT COUNT(*) AS p FROM (SELECT DISTINCT "
        "LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e)), "
        "trans AS (SELECT COUNT(*) AS t FROM e e1 "
        "JOIN e e2 ON e1.dst = e2.src "
        "JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst "
        "WHERE e1.src <> e2.dst), "
        "cyc AS (SELECT COUNT(*) AS c FROM e e1 "
        "JOIN e e2 ON e1.dst = e2.src "
        "JOIN e e3 ON e3.src = e2.dst AND e3.dst = e1.src "
        "WHERE e1.src < e1.dst AND e1.src < e2.dst) "
        "SELECT 'mutual_dyads' AS pattern, CAST(m AS BIGINT) AS cnt FROM mutual "
        "UNION ALL SELECT 'asym_dyads', CAST(p - m AS BIGINT) FROM pairs, mutual "
        "UNION ALL SELECT 'transitive_triads', CAST(t AS BIGINT) FROM trans "
        "UNION ALL SELECT 'cyclic_triads', CAST(c AS BIGINT) FROM cyc"
    )
