"""Multinomial naive Bayes over the documents table — train-on-half,
classify-the-other-half source attribution, the classical supervised
baseline a curation pipeline runs to (a) sanity-check that sources are
distinguishable at all and (b) catch mislabeled / contaminated shards
(a doc whose predicted source disagrees with its label with a big
margin is worth a look).

Exactness contract (matches bigram_surprisal's): ln runs ONCE on the
(token, class) weight table and is floored to integer micro-nats; all
per-document scoring is integer sums of those quantized weights, so
summation order cannot matter and both engines agree bit-for-bit.

Scale shape: the weight table is |V|·|classes| rows (vocabulary-bound,
not corpus-bound) and joins the long-form (doc, token, count) table on
the token key — one shuffle each side; the per-doc argmax is a window
over |classes| rows per doc. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .textstats import NORM_SQL, norm_text


def nb_confusion(
    docs: DataFrame,
    label_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Train multinomial NB (add-1 smoothing) on docs with even
    doc_id, classify the odd half, return the confusion matrix.

    Scoring: score(d, s) = prior_micro(s) + Σ_t c_dt · w_micro(t, s)
    where w_micro(t, s) = ⌊10⁶·ln((c_st + 1)/(c_s + V))⌋ over the
    TRAIN vocabulary V (unseen test tokens are dropped — the standard
    closed-vocabulary convention); prior_micro = ⌊10⁶·ln(n_s/N)⌋.
    Ties break toward the lexicographically smaller class.

    Result: (true_source, pred_source, n_docs)."""
    toks = docs.select(
        "doc_id",
        F.col(label_col).alias("label"),
        F.explode(F.split(norm_text(text_col), " ")).alias("t"),
    ).where(F.length("t") > 0)
    train = toks.where(F.col("doc_id") % 2 == 0)
    test = toks.where(F.col("doc_id") % 2 == 1)

    cst = train.groupBy("label", "t").agg(F.count(F.lit(1)).alias("c_st"))
    cs = train.groupBy("label").agg(F.count(F.lit(1)).alias("c_s"))
    vocab = train.select("t").distinct()
    v = vocab.count()
    # weights for EVERY (train-vocab token, class) pair — absent pairs
    # get the smoothing floor ln(1/(c_s+V)), so a class is never
    # unfairly favored just because a token never co-occurred with it
    grid = vocab.crossJoin(cs)
    w = grid.join(cst, ["label", "t"], "left").select(
        "label",
        "t",
        F.floor(
            F.lit(1_000_000)
            * F.log(
                (F.coalesce("c_st", F.lit(0)) + 1).cast("double")
                / (F.col("c_s") + F.lit(v))
            )
        )
        .cast("long")
        .alias("w_micro"),
    )
    n_train_docs = docs.where(F.col("doc_id") % 2 == 0).count()
    prior = (
        docs.where(F.col("doc_id") % 2 == 0)
        .groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("n_s"))
        .select(
            "label",
            F.floor(
                F.lit(1_000_000)
                * F.log(F.col("n_s").cast("double") / F.lit(n_train_docs))
            )
            .cast("long")
            .alias("prior_micro"),
        )
    )
    dt = test.groupBy("doc_id", "label", "t").agg(
        F.count(F.lit(1)).alias("c_dt")
    )
    likes = (
        dt.join(w.withColumnRenamed("label", "cls"), "t")
        .groupBy("doc_id", "label", "cls")
        .agg(F.sum(F.col("c_dt") * F.col("w_micro")).alias("like"))
    )
    # grid right side: EVERY (test doc × class) cell, so an all-OOV doc
    # still gets scored (prior only) instead of silently vanishing
    test_docs = docs.where(F.col("doc_id") % 2 == 1).select(
        "doc_id", F.col(label_col).alias("label")
    )
    grid = test_docs.crossJoin(
        F.broadcast(prior.withColumnRenamed("label", "cls"))
    )
    scored = grid.join(likes, ["doc_id", "label", "cls"], "left").select(
        "doc_id",
        "label",
        "cls",
        (F.coalesce("like", F.lit(0)) + F.col("prior_micro")).alias("score"),
    )
    pick = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cls"))
    return (
        scored.withColumn("r", F.row_number().over(pick))
        .where(F.col("r") == 1)
        .groupBy(
            F.col("label").alias("true_source"),
            F.col("cls").alias("pred_source"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def nb_confusion_sql(
    label_col: str = "source", table: str = "documents"
) -> str:
    """DuckDB twin of :func:`nb_confusion`."""
    return (
        f"WITH toks AS (SELECT doc_id, {label_col} AS label, "
        f"UNNEST(string_split({NORM_SQL}, ' ')) AS t FROM {table}), "
        "toksnz AS (SELECT * FROM toks WHERE length(t) > 0), "
        "train AS (SELECT * FROM toksnz WHERE doc_id % 2 = 0), "
        "test AS (SELECT * FROM toksnz WHERE doc_id % 2 = 1), "
        "cst AS (SELECT label, t, COUNT(*) AS c_st FROM train "
        "GROUP BY label, t), "
        "cs AS (SELECT label, COUNT(*) AS c_s FROM train GROUP BY label), "
        "vocab AS (SELECT DISTINCT t FROM train), "
        "vn AS (SELECT COUNT(*) AS v FROM vocab), "
        "w AS (SELECT cs.label, vocab.t, "
        "CAST(FLOOR(1000000 * LN(CAST(COALESCE(cst.c_st, 0) + 1 AS DOUBLE)"
        " / (cs.c_s + vn.v))) AS BIGINT) AS w_micro "
        "FROM vocab CROSS JOIN cs CROSS JOIN vn "
        "LEFT JOIN cst ON cst.label = cs.label AND cst.t = vocab.t), "
        f"tr_docs AS (SELECT doc_id, {label_col} AS label FROM {table} "
        "WHERE doc_id % 2 = 0), "
        "nn AS (SELECT COUNT(*) AS n FROM tr_docs), "
        "prior AS (SELECT label, CAST(FLOOR(1000000 * "
        "LN(CAST(COUNT(*) AS DOUBLE) / nn.n)) AS BIGINT) AS prior_micro "
        "FROM tr_docs, nn GROUP BY label, nn.n), "
        "dt AS (SELECT doc_id, label, t, COUNT(*) AS c_dt FROM test "
        "GROUP BY doc_id, label, t), "
        "likes AS (SELECT dt.doc_id, dt.label, w.label AS cls, "
        "CAST(SUM(dt.c_dt * w.w_micro) AS BIGINT) AS like "
        "FROM dt JOIN w ON w.t = dt.t GROUP BY dt.doc_id, dt.label, w.label), "
        f"test_docs AS (SELECT doc_id, {label_col} AS label FROM {table} "
        "WHERE doc_id % 2 = 1), "
        "grid AS (SELECT td.doc_id, td.label, p.label AS cls, "
        "p.prior_micro FROM test_docs td CROSS JOIN prior p), "
        "final AS (SELECT g.doc_id, g.label, g.cls, "
        "COALESCE(l.like, 0) + g.prior_micro AS score FROM grid g "
        "LEFT JOIN likes l ON l.doc_id = g.doc_id AND l.cls = g.cls), "
        "pick AS (SELECT doc_id, label, cls, "
        "ROW_NUMBER() OVER (PARTITION BY doc_id "
        "ORDER BY score DESC, cls) AS r FROM final) "
        "SELECT label AS true_source, cls AS pred_source, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs FROM pick WHERE r = 1 "
        "GROUP BY label, cls"
    )
