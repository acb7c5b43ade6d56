"""Feature propagation over the link graph — the GNN mean-aggregation
primitive (GCN / GraphSAGE-mean, Kipf & Welling 2017 / Hamilton et al.
2017) as a relational superstep: h'(v) = (h(v) + Σ_{u→v} h(u)) / (1 +
indeg(v)). Together with ``neighbor_sample`` (deterministic GraphSAGE
fan-out) this gives a training-data pipeline the two halves of graph
feature engineering: sample neighborhoods, aggregate features.

Exactness: embeddings are float32; each value is quantized ONCE to a
10⁶ fixed-point integer (float→double promotion and the multiply are
exactly reproducible across engines), then every round is integer
sum + one floor division — order-independent, so the DuckDB oracle
hash-matches bit-for-bit (the pagerank5/katz convention).

Scale shape: the relational form explodes (vertex, dim) — dim× the
row count, ONE shuffle per round keyed by (dst, dim), partial aggs
map-side. That is the right plan up to ~10² dims; for wide embeddings
at 100 TB the cogroup-CSR backend (graph/csr.py, pagerank_cogroup's
executor-cached kernel) would carry the whole vector per row into a
numpy scatter-add instead — same superstep contract, fewer rows. The
relational form is what has an exact SQL twin, so it is the oracle
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

FEAT_SCALE = 10**6  # fixed-point: feature 1.0 == 10^6


def quantize_features(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, dim, f_fx): one row per vector component, f_fx =
    ⌊value·10⁶⌋ as BIGINT. ``posexplode`` keeps dim 0-indexed."""
    return embeddings.select(
        F.col(id_col).alias("id"),
        F.posexplode(vec_col).alias("dim", "val"),
    ).select(
        "id",
        "dim",
        F.floor(F.col("val").cast("double") * FEAT_SCALE)
        .cast("long")
        .alias("f_fx"),
    )


def feature_propagation(
    embeddings: DataFrame,
    edges: DataFrame,
    rounds: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``rounds`` rounds of mean-with-self aggregation along DIRECTED
    edges (src's features flow to dst). Vertices missing from
    ``embeddings`` contribute nothing and receive nothing (inner joins
    — the standard featureless-node handling is a zero vector, which
    is what an absent row sums as). Result: (id, dim, f_fx).
    """
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    state = quantize_features(embeddings, id_col, vec_col)
    indeg = e.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("ind")
    )
    for _ in range(rounds):
        msgs = (
            state.join(e, state["id"] == e["src"])
            .groupBy(F.col("dst").alias("id"), "dim")
            .agg(F.sum("f_fx").alias("acc"))
        )
        state = (
            state.join(msgs, ["id", "dim"], "left")
            .join(indeg, "id", "left")
            .select(
                "id",
                "dim",
                F.expr(
                    "(f_fx + coalesce(acc, 0L))"
                    " div (1 + coalesce(ind, 0L))"
                ).cast("long").alias("f_fx"),
            )
        )
    return state


def feature_propagation_sql(
    edges_cte: str,
    rounds: int = 1,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`feature_propagation` over an
    ``edges(src, dst)`` CTE. Parallel UNNESTs of ``range(len(v))`` and
    ``v`` zip index with value — DuckDB's ``range`` is 0-based, which
    matches posexplode's dims directly."""
    ctes = [
        f"WITH {edges_cte}",
        "e AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst)",
        "ind AS (SELECT dst AS id, COUNT(*) AS ind FROM e GROUP BY dst)",
        f"sraw AS (SELECT {id_col} AS id,"
        f" UNNEST(range(len({vec_col}))) AS dim,"
        f" UNNEST({vec_col}) AS val FROM {table})",
        f"s0 AS (SELECT id, CAST(dim AS INT) AS dim,"
        f" CAST(FLOOR(CAST(val AS DOUBLE) * {FEAT_SCALE}) AS BIGINT)"
        f" AS f_fx FROM sraw)",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"s{k} AS (SELECT s.id, s.dim, CAST((s.f_fx +"
            f" COALESCE(m.acc, 0)) // (1 + COALESCE(ind.ind, 0))"
            f" AS BIGINT) AS f_fx FROM s{k-1} s"
            f" LEFT JOIN (SELECT e.dst AS id, p.dim,"
            f" CAST(SUM(p.f_fx) AS BIGINT) AS acc FROM s{k-1} p"
            f" JOIN e ON e.src = p.id GROUP BY e.dst, p.dim) m"
            f" ON m.id = s.id AND m.dim = s.dim"
            f" LEFT JOIN ind ON ind.id = s.id)"
        )
    return ", ".join(ctes) + f" SELECT id, dim, f_fx FROM s{rounds}"
