"""TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004): the
engine's PageRank fixed-point machinery pointed at a word
co-occurrence graph instead of a link graph.

Graph: adjacent-token pairs (window 2) over the shared normalizer,
symmetrized, edge weight = corpus-wide co-occurrence count. Rank:
``iters`` rounds of weighted PageRank in the repo's scaled-int64 fixed
point (pagerank5's 15/85 integer split, contributions
``pr·w DIV wdeg``), so the DuckDB twin hash-matches bit-for-bit. The
top-k tokens by rank are the corpus' keywords — the query-free seed
vocabulary a curation stack mines before any search log exists.

Scale shape: the co-occurrence graph is vocabulary² bounded but
co-occurrence-sparse; building it is one posexplode + self-join on
(doc, pos+1) — positions are data, not Python. Iterations are the
standard scatter join + partial-agg sum keyed by token. The whole op
reuses the link-graph plan shapes verbatim — the point of building
text ops on a graph engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textstats import NORM_SQL, norm_text

TR_SCALE = 10**12


def textrank_keywords(
    docs: DataFrame,
    k: int = 20,
    iters: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Top-k (token, tr_fx) by ``iters``-round weighted PageRank over
    the adjacent-token co-occurrence graph."""
    pos = docs.select(
        "doc_id",
        F.posexplode(F.split(norm_text(text_col), " ")).alias("pos", "token"),
    ).where(F.length("token") > 0)
    nxt = pos.select(
        "doc_id",
        (F.col("pos") - 1).alias("pos"),
        F.col("token").alias("token_b"),
    )
    adj = (
        pos.join(nxt, ["doc_id", "pos"])
        .where(F.col("token") != F.col("token_b"))
        .select(F.col("token").alias("a"), F.col("token_b").alias("b"))
    )
    edges = (
        adj.select("a", "b")
        .unionAll(adj.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    wdeg = edges.groupBy("a").agg(F.sum("w").alias("wdeg"))
    pr = wdeg.select(F.col("a").alias("t"), F.lit(TR_SCALE).alias("pr"))
    base = 15 * TR_SCALE // 100
    for _ in range(iters):
        contrib = (
            pr.join(edges, pr["t"] == edges["a"])
            .join(wdeg, "a")
            .select(
                F.col("b").alias("t2"),
                F.expr("(pr * w) DIV wdeg").alias("c"),
            )
            .groupBy("t2")
            .agg(F.sum("c").alias("acc"))
        )
        pr = (
            wdeg.select(F.col("a").alias("t"))
            .join(contrib, F.col("t") == F.col("t2"), "left")
            .select(
                "t",
                F.expr(f"{base} + (85 * coalesce(acc, 0)) DIV 100")
                .cast("long")
                .alias("pr"),
            )
        )
    return (
        pr.select(F.col("t").alias("token"), F.col("pr").alias("tr_fx"))
        .orderBy(F.desc("tr_fx"), F.asc("token"))
        .limit(k)
    )


def textrank_keywords_sql(
    k: int = 20, iters: int = 5, doc_table: str = "documents"
) -> str:
    """DuckDB twin of :func:`textrank_keywords`."""
    ctes = [
        f"norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table})",
        # the build_postings_sql positional idiom: indexed list_transform
        # lambda (1-based), this DuckDB lacks WITH ORDINALITY
        "pos AS (SELECT doc_id, "
        "UNNEST(list_transform(string_split(nt, ' '), (x, i) -> "
        "{'tok': x, 'p': i}), recursive := true) FROM norm)",
        "posf AS (SELECT doc_id, p, tok FROM pos WHERE length(tok) > 0)",
        "adj AS (SELECT x.tok AS a, y.tok AS b FROM posf x "
        "JOIN posf y ON x.doc_id = y.doc_id AND y.p = x.p + 1 "
        "WHERE x.tok <> y.tok)",
        "edges AS (SELECT a, b, COUNT(*) AS w FROM "
        "(SELECT a, b FROM adj UNION ALL SELECT b, a FROM adj) GROUP BY a, b)",
        "wdeg AS (SELECT a, CAST(SUM(w) AS BIGINT) AS wdeg "
        "FROM edges GROUP BY a)",
        f"pr0 AS (SELECT a AS t, {TR_SCALE}::BIGINT AS pr FROM wdeg)",
    ]
    base = 15 * TR_SCALE // 100
    for i in range(1, iters + 1):
        ctes.append(
            f"pr{i} AS MATERIALIZED (SELECT w0.a AS t, CAST({base} + "
            "(85 * COALESCE(s.acc, 0)) // 100 AS BIGINT) AS pr "
            "FROM wdeg w0 LEFT JOIN (SELECT e.b AS t, "
            f"CAST(SUM((p.pr * e.w) // d.wdeg) AS BIGINT) AS acc "
            f"FROM pr{i-1} p JOIN edges e ON e.a = p.t "
            "JOIN wdeg d ON d.a = p.t GROUP BY e.b) s ON w0.a = s.t)"
        )
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT t AS token, pr AS tr_fx FROM pr{iters} "
        f"ORDER BY tr_fx DESC, token ASC LIMIT {k}"
    )
