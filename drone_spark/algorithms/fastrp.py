"""FastRP-style node embeddings in exact integer arithmetic.

FastRP (Chen et al., CIKM 2019) builds node embeddings as degree-
normalized powers of the adjacency matrix applied to a *very sparse
random projection* — no sampling walks, no gradient steps, no Python.
This implementation keeps the whole computation in int64 so the
DuckDB twin hash-matches:

- the projection is the md5-sign matrix R[v, j] = ±SCALE (one bit of
  the portable 60-bit hash per (vertex, dimension)),
- each propagation is e_k(v,j) = Σ_{u→v} e_{k-1}(u,j) DIV outdeg(u) —
  the column-stochastic A^T step with truncating integer division
  (DuckDB ``//`` and Spark ``DIV`` both truncate toward zero, verified
  including negatives).

Plan shape: one edges⋈state equi-join + partial-agg SUM per iteration
per the whole d-dimensional state (dimensions ride along as rows keyed
(v, j) — no per-dimension jobs), exactly the PageRank scatter with a
d-wide state. At 10^12 vertices the state is |V|·d rows, the same
order as the walk-based skip-gram tier but with zero Python and
deterministic lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RP_SCALE = 10**6


def fastrp_embeddings(
    edges: DataFrame, dims: int = 4, iters: int = 2
) -> DataFrame:
    """Returns (vid, dim, val) — the ``iters``-step propagated signed
    projection, int64 throughout."""
    spark = edges.sparkSession
    v = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .select(F.col("src").alias("u"), "outdeg")
    )
    dgrid = spark.range(dims).select(F.col("id").cast("int").alias("j"))
    sign = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("rp"),
                        F.col("j").cast("string"),
                        F.lit(":"),
                        F.col("id").cast("string"),
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
    )
    state = v.crossJoin(F.broadcast(dgrid)).select(
        "id",
        "j",
        (sign * F.lit(2 * RP_SCALE) - F.lit(RP_SCALE)).alias("val"),
    )
    for _ in range(iters):
        contrib = (
            state.join(deg, state["id"] == deg["u"])
            .join(edges, state["id"] == edges["src"])
            .select(
                F.col("dst").alias("nid"),
                "j",
                F.expr("val DIV outdeg").alias("c"),
            )
            .groupBy("nid", "j")
            .agg(F.sum("c").alias("val"))
            .withColumnRenamed("nid", "id")
        )
        state = (
            v.crossJoin(F.broadcast(dgrid))
            .join(contrib, ["id", "j"], "left")
            .select(
                "id", "j", F.coalesce("val", F.lit(0)).cast("long").alias("val")
            )
        )
    return state.select(F.col("id").alias("vid"), F.col("j").alias("dim"), "val")


def fastrp_embeddings_sql(
    edges_cte: str, dims: int = 4, iters: int = 2
) -> str:
    """DuckDB twin — ``edges_cte`` must define ``edges(src, dst)``."""
    sign = (
        "(('0x' || substr(md5('rp' || CAST(j AS VARCHAR) || ':' || "
        "CAST(id AS VARCHAR)), 1, 15))::BIGINT & 1)"
    )
    ctes = [
        edges_cte,
        "v AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges)",
        "deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        f"dims AS (SELECT CAST(range AS INTEGER) AS j FROM range({dims}))",
        f"e0 AS (SELECT id, j, CAST({sign} * {2 * RP_SCALE} - {RP_SCALE} "
        "AS BIGINT) AS val FROM v CROSS JOIN dims)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"e{k} AS MATERIALIZED (SELECT g.id, g.j, "
            "CAST(COALESCE(s.val, 0) AS BIGINT) AS val "
            "FROM (SELECT id, j FROM v CROSS JOIN dims) g LEFT JOIN "
            f"(SELECT e.dst AS id, p.j, CAST(SUM(p.val // d.outdeg) AS BIGINT) "
            f"AS val FROM e{k-1} p JOIN deg d ON p.id = d.src "
            "JOIN edges e ON e.src = p.id GROUP BY e.dst, p.j) s "
            "ON g.id = s.id AND g.j = s.j)"
        )
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT id AS vid, j AS dim, val FROM e{iters}"
    )
