"""Conductance sweep cut over a vertex ranking — the second half of
the Andersen–Chung–Lang local-clustering recipe (FOCS 2006): rank
vertices by ppr/degree, then scan prefixes and report each prefix's
cut size, volume and conductance; the argmin prefix is the local
community around the PPR seed set.

Everything stays in exact int64: the order key is
``score·10^6 DIV deg`` (a fixed-point ppr/deg), the cut curve comes
from a ±1 difference array prefix-summed over ranks, and conductance
is reported in ppm via integer division — so the DuckDB twin (naive
global windows) hash-matches bit-for-bit.

Scale shape — three places a naive sweep serializes, all avoided:

- vertex ranks use fusion.ordinal_rank (distinct-key histogram prefix
  + tie-group row_number), not a global ROW_NUMBER;
- BOTH running sums (volume by rank, cut difference array by rank) use
  the two-level bucketed prefix scan (pack_bins pattern): 1024-wide
  rank buckets cumsum in parallel, a buckets-row offset table
  broadcasts back;
- the difference array means each undirected edge is touched exactly
  once (+1 at its min rank, −1 at its max rank) — no per-prefix edge
  recount, which would be O(n·m).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_BUCKET = 1024


def _prefix_over_rank(
    df: DataFrame, rank_col: str, value_col: str, out_col: str
) -> DataFrame:
    """Inclusive prefix sum of ``value_col`` in ``rank_col`` order via
    the two-level bucketed scan (ranks must be dense 1..n)."""
    b = df.withColumn(
        "_b", ((F.col(rank_col) - 1) / _BUCKET).cast("long")
    )
    w_in = (
        Window.partitionBy("_b")
        .orderBy(rank_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = b.withColumn("_loc", F.sum(value_col).over(w_in))
    totals = b.groupBy("_b").agg(F.sum(value_col).alias("_bt"))
    w_b = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_b", F.coalesce(F.sum("_bt").over(w_b), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_b")
        .withColumn(out_col, (F.col("_off") + F.col("_loc")).cast("long"))
        .drop("_b", "_loc", "_off")
    )


def sweep_cut(scores: DataFrame, edges: DataFrame) -> DataFrame:
    """Sweep the ranking induced by ``scores`` (vid, score_fx) over the
    symmetrized ``edges``. Returns (k, cut_edges, vol, cond_ppm) for
    every prefix 1 ≤ k < n, ordered key = score_fx·10^6 DIV deg desc,
    ties on vid."""
    from drone_spark.ops.fusion import ordinal_rank

    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    keyed = deg.join(
        scores.select(F.col("vid").alias("id"), "score_fx"), "id"
    ).select(
        F.col("id").alias("vid"),
        "deg",
        F.expr("(score_fx * 1000000) DIV deg").alias("score"),
    )
    ranked = ordinal_rank(keyed, "score", "vid", rank_col="r").select(
        "vid", "deg", "r"
    )
    vol = _prefix_over_rank(ranked, "r", "deg", "vol").select("r", "vol")
    ra = ranked.select(F.col("vid").alias("a"), F.col("r").alias("r_a"))
    rb = ranked.select(F.col("vid").alias("b"), F.col("r").alias("r_b"))
    er = und.join(ra, "a").join(rb, "b").select(
        F.least("r_a", "r_b").alias("rmin"), F.greatest("r_a", "r_b").alias("rmax")
    )
    deltas = (
        er.select(F.col("rmin").alias("r"), F.lit(1).alias("d"))
        .unionAll(er.select(F.col("rmax").alias("r"), F.lit(-1).alias("d")))
        .groupBy("r")
        .agg(F.sum("d").alias("delta"))
    )
    with_delta = ranked.join(deltas, "r", "left").select(
        "r", F.coalesce("delta", F.lit(0)).alias("delta")
    )
    cut = _prefix_over_rank(with_delta, "r", "delta", "cut").select("r", "cut")
    n = ranked.count()
    total = und.count() * 2
    return (
        vol.join(cut, "r")
        .where(F.col("r") < n)
        .select(
            F.col("r").alias("k"),
            F.col("cut").alias("cut_edges"),
            "vol",
            F.expr(f"(cut * 1000000) DIV least(vol, {total} - vol)").alias(
                "cond_ppm"
            ),
        )
    )


def sweep_cut_sql(scores_cte: str, edges_cte: str) -> str:
    """DuckDB twin — ``scores_cte`` must define ``scores(vid,
    score_fx)``, ``edges_cte`` must define ``edges(src, dst)``. Naive
    global windows prove the two-level scans value-identical."""
    return (
        f"WITH {edges_cte}, {scores_cte}, "
        "und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b "
        "FROM edges WHERE src <> dst), "
        "deg AS (SELECT id, COUNT(*) AS deg FROM "
        "(SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und) GROUP BY id), "
        "keyed AS (SELECT deg.id AS vid, deg.deg, "
        "(s.score_fx * 1000000) // deg.deg AS score "
        "FROM deg JOIN scores s ON deg.id = s.vid), "
        "ranked AS (SELECT vid, deg, ROW_NUMBER() OVER "
        "(ORDER BY score DESC, vid ASC) AS r FROM keyed), "
        "vol AS (SELECT r, SUM(deg) OVER (ORDER BY r) AS vol FROM ranked), "
        "er AS (SELECT LEAST(ra.r, rb.r) AS rmin, GREATEST(ra.r, rb.r) AS rmax "
        "FROM und JOIN ranked ra ON und.a = ra.vid "
        "JOIN ranked rb ON und.b = rb.vid), "
        "deltas AS (SELECT r, SUM(d) AS delta FROM "
        "(SELECT rmin AS r, 1 AS d FROM er "
        "UNION ALL SELECT rmax AS r, -1 AS d FROM er) GROUP BY r), "
        "cut AS (SELECT ranked.r, SUM(COALESCE(deltas.delta, 0)) OVER "
        "(ORDER BY ranked.r) AS cut FROM ranked "
        "LEFT JOIN deltas ON ranked.r = deltas.r), "
        "tot AS (SELECT SUM(deg) AS vt FROM ranked), "
        "nn AS (SELECT COUNT(*) AS n FROM ranked) "
        "SELECT v.r AS k, CAST(c.cut AS BIGINT) AS cut_edges, "
        "CAST(v.vol AS BIGINT) AS vol, "
        "CAST((c.cut * 1000000) // LEAST(v.vol, tot.vt - v.vol) AS BIGINT) "
        "AS cond_ppm "
        "FROM vol v JOIN cut c ON v.r = c.r, tot, nn WHERE v.r < nn.n"
    )
