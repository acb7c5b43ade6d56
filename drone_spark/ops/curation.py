"""Composed curation verdict — the C4/Gopher filter pipeline as one op.

Production pretraining pipelines (C4, Raffel et al. 2020 §2.2; Gopher /
MassiveText, Rae et al. 2021 §A1; RefinedWeb, Penedo et al. 2023) chain
per-document filters — length bounds, quality heuristics, repetition
caps, language allow-list — and keep a *reason* for every drop so the
funnel is auditable. This module composes the engine's existing signal
ops (:mod:`textstats`: quality_score, repetition_stats, lang_id) into a
single verdict table: ``(doc_id, n_toks, quality, lang_pred, reasons,
keep)`` where ``reasons`` is an additive bitmask and ``keep = 1`` iff
``reasons = 0``.

Everything stays exact-integer (basis points, floor division, bitmask)
so the DuckDB oracle hash-matches bit-for-bit; booleans are emitted as
BIGINT 0/1 for the same reason.

Scale shape: three signal jobs that are each map-only or
two-level-partial-agg over the documents scan, joined on the uniform
``doc_id`` key — no step is heavier than the signals the pipeline
already computes, and the verdict join adds one co-partitioned shuffle.
At 100 TB the whole pipeline is one pass over the corpus plus the
(doc_id → doc_id) joins; nothing is quadratic and no key is hotter than
a single document id.

Reason bits (stable public contract, additive):

====  ==============================================================
bit   meaning
====  ==============================================================
1     too short — ``n_toks < min_tokens``
2     too long — ``n_toks > max_tokens``
4     low quality — ``quality < min_quality`` (see quality_score)
8     repetitive — any of top_tok_bp / dup2_bp / dup3_bp over cap
16    language not in ``allowed_langs``
====  ==============================================================
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .textstats import (
    NORM_SQL as _NORM,
    lang_id,
    lang_id_sql,
    norm_text,
    quality_score,
    repetition_stats,
    repetition_stats_sql,
    token_count,
)

R_TOO_SHORT = 1
R_TOO_LONG = 2
R_LOW_QUALITY = 4
R_REPETITIVE = 8
R_LANG = 16


def curation_verdict(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_quality: int = 50,
    max_top_tok_bp: int = 2000,
    max_dup2_bp: int = 2000,
    max_dup3_bp: int = 1500,
    allowed_langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """Per-document keep/drop verdict with an auditable reason bitmask.

    Defaults follow the published filters loosely: Gopher drops docs
    whose most common word exceeds 20% of tokens (here 2000 bp) or
    whose duplicate 2-/3-gram fraction exceeds ~20%/15%; C4 drops short
    pages; the language allow-list is the MassiveText English filter.
    Thresholds are parameters — the *composition* is the operator.
    """
    q = quality_score(docs, text_col)
    r = repetition_stats(docs, text_col=text_col)
    lg = lang_id(docs, text_col)
    joined = (
        r.join(q, "doc_id")
        .join(lg, "doc_id")
    )
    bit = lambda cond, b: F.when(cond, F.lit(b)).otherwise(F.lit(0))  # noqa: E731
    reasons = (
        bit(F.col("n_toks") < min_tokens, R_TOO_SHORT)
        + bit(F.col("n_toks") > max_tokens, R_TOO_LONG)
        + bit(F.col("quality") < min_quality, R_LOW_QUALITY)
        + bit(
            (F.col("top_tok_bp") > max_top_tok_bp)
            | (F.col("dup2_bp") > max_dup2_bp)
            | (F.col("dup3_bp") > max_dup3_bp),
            R_REPETITIVE,
        )
        + bit(~F.col("lang_pred").isin(*allowed_langs), R_LANG)
    )
    return joined.select(
        "doc_id",
        "n_toks",
        "quality",
        "lang_pred",
        reasons.cast("long").alias("reasons"),
        F.when(reasons == 0, F.lit(1)).otherwise(F.lit(0))
        .cast("long")
        .alias("keep"),
    )


def budget_sample(
    docs: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic token-budget corpus sampling: walk documents in
    ``md5(doc_id)`` order (hash-uniform, layout-independent — the
    engine's standing sampling convention) and keep each doc whose
    running token total still fits ``budget_tokens``; emit
    ``(doc_id, n_toks, cum_toks, kept)`` with kept as BIGINT 0/1.
    This is the "cut a 500B-token corpus out of a 5T-token pool" step
    of every pretraining data plan, made reproducible: the kept set is
    a pure function of ids, never of partitioning or timing.

    Scale shape — a naive ``SUM() OVER (ORDER BY md5)`` window has no
    partition key, so Spark collapses the whole table into ONE task
    (the classic "No Partition Defined for Window" scale bug). Instead
    this runs the textbook distributed prefix-sum: the first two hex
    chars of the md5 split the order into 256 contiguous ranges; the
    running sum is computed per bucket (parallel window over
    co-partitioned data), and each bucket's starting offset is the
    prefix-sum of the per-bucket totals — a 256-row driver computation
    (a scalar-metrics-sized collect, the engine's allowed class). The
    result is bit-identical to the single-ordering cumsum because the
    bucket is a *prefix* of the md5 priority, so (bucket, pri) order
    IS pri order."""
    pr = F.md5(F.col(id_col).cast("string"))
    # two passes over (doc_id, text) by design: the 256-row totals job,
    # then the windowed pass — cheaper and more predictable at scale
    # than caching the whole projected corpus between them
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(text_col).cast("long").alias("n_toks"),
        pr.alias("pri"),
        F.substring(pr, 1, 2).alias("bucket"),
    )
    totals = {
        r["bucket"]: r["tot"]
        for r in base.groupBy("bucket")
        .agg(F.sum("n_toks").alias("tot"))
        .collect()
    }
    if not totals:  # empty corpus: keep the output shape, zero rows
        return base.select(
            "doc_id",
            "n_toks",
            F.lit(0).cast("long").alias("cum_toks"),
            F.lit(0).cast("long").alias("kept"),
        )
    offsets, running = {}, 0
    for b in sorted(totals):  # lexical = md5-prefix order
        offsets[b] = running
        running += totals[b]
    off = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("bucket").orderBy("pri").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (F.sum("n_toks").over(w) + off[F.col("bucket")]).alias("cum_toks")
    return base.select("doc_id", "n_toks", cum).select(
        "doc_id",
        "n_toks",
        "cum_toks",
        F.when(F.col("cum_toks") <= budget_tokens, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("kept"),
    )


def budget_sample_sql(budget_tokens: int, doc_table: str = "documents") -> str:
    """DuckDB twin of :func:`budget_sample` — the single global-window
    cumsum the distributed prefix-sum is provably equivalent to (same
    md5 total order; doc_id ties impossible since ids are unique)."""
    cum = (
        "SUM(n_toks) OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)) "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    return (
        "WITH toks AS (SELECT doc_id, "
        "CASE WHEN trim(text) = '' THEN 0 ELSE "
        "CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) "
        "END AS n_toks "
        f"FROM {doc_table}) "
        f"SELECT doc_id, n_toks, CAST({cum} AS BIGINT) AS cum_toks, "
        f"CAST(CASE WHEN {cum} <= {budget_tokens} THEN 1 ELSE 0 END "
        "AS BIGINT) AS kept FROM toks"
    )


def curation_verdict_sql(
    doc_table: str = "documents",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_quality: int = 50,
    max_top_tok_bp: int = 2000,
    max_dup2_bp: int = 2000,
    max_dup3_bp: int = 1500,
    allowed_langs: tuple[str, ...] = ("en",),
) -> str:
    """DuckDB twin of :func:`curation_verdict` — the three signal
    queries as subqueries joined on doc_id, same integer bitmask."""
    quality = (
        "SELECT doc_id, GREATEST(0, 100 "
        "- LEAST(40, (n_punct * 100) // GREATEST(n_chars, 1)) "
        "- LEAST(30, (n_digits * 100) // GREATEST(n_chars, 1)) "
        "- CASE WHEN n_tokens < 10 THEN 30 ELSE 0 END) AS quality FROM ("
        "SELECT doc_id, length(text) AS n_chars, "
        "CASE WHEN trim(text) = '' THEN 0 ELSE "
        "length(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens, "
        "length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct, "
        "length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits "
        f"FROM {doc_table})"
    )
    langs = ", ".join(f"'{lang}'" for lang in allowed_langs)
    return (
        f"WITH rep AS ({repetition_stats_sql(doc_table)}), "
        f"qual AS ({quality}), "
        f"lng AS ({lang_id_sql(doc_table)}), "
        "bits AS (SELECT r.doc_id, r.n_toks, q.quality, l.lang_pred, "
        f"(CASE WHEN r.n_toks < {min_tokens} THEN {R_TOO_SHORT} ELSE 0 END "
        f"+ CASE WHEN r.n_toks > {max_tokens} THEN {R_TOO_LONG} ELSE 0 END "
        f"+ CASE WHEN q.quality < {min_quality} THEN {R_LOW_QUALITY} ELSE 0 END "
        f"+ CASE WHEN r.top_tok_bp > {max_top_tok_bp} "
        f"OR r.dup2_bp > {max_dup2_bp} OR r.dup3_bp > {max_dup3_bp} "
        f"THEN {R_REPETITIVE} ELSE 0 END "
        f"+ CASE WHEN l.lang_pred NOT IN ({langs}) THEN {R_LANG} ELSE 0 END"
        ") AS reasons "
        "FROM rep r JOIN qual q ON r.doc_id = q.doc_id "
        "JOIN lng l ON r.doc_id = l.doc_id) "
        "SELECT doc_id, n_toks, quality, lang_pred, "
        "CAST(reasons AS BIGINT) AS reasons, "
        "CAST(CASE WHEN reasons = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep "
        "FROM bits"
    )


def source_scorecard(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source corpus health dashboard — the aggregation every
    curation pipeline reports before deciding source mixture weights
    (which crawls/feeds to up/down-sample): document count, mean
    quality, exact-duplicate exposure, and language concentration, per
    ``source`` column value.

    Result: (source, n_docs, mean_quality, n_dup_docs, top_lang,
    top_lang_share_ppm) where mean_quality = ⌊Σquality/n⌋ (integer —
    the scorecard convention everywhere here), n_dup_docs counts
    documents whose normalized-text fingerprint occurs ≥2 times
    CORPUS-WIDE (cross-source duplication charges every copy — the
    mixture-weighting view, unlike exact_dedup's keep-one view), and
    top_lang is the modal lang_id prediction (ties → lexicographically
    smallest, deterministic).

    Pure composition of the tier's own primitives (quality_score,
    lang_id, fingerprint grouping) — one pass each, partial-agg
    rollups keyed by the low-cardinality source column; the fingerprint
    group sizes are the only corpus-keyed shuffle, on uniform md5 keys.
    """
    base = docs.select("doc_id", "source")
    q = quality_score(docs, text_col)
    lang = lang_id(docs, text_col)
    fp = docs.select(
        "doc_id", "source", F.md5(norm_text(text_col)).alias("fprint")
    )
    gsz = fp.groupBy("fprint").agg(F.count(F.lit(1)).alias("gsz"))
    dup = (
        fp.join(gsz, "fprint")
        .groupBy("source")
        .agg(
            F.sum((F.col("gsz") >= 2).cast("long")).cast("long")
            .alias("n_dup_docs")
        )
    )
    agg = (
        base.join(q, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("quality").alias("sumq"),
        )
    )
    lcounts = (
        base.join(lang, "doc_id")
        .groupBy("source", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    lmode = (
        lcounts.withColumn(
            "pick", F.struct((-F.col("n")).alias("negn"), "lang_pred")
        )
        .groupBy("source")
        .agg(F.min("pick").alias("pick"))
        .select(
            "source",
            F.col("pick.lang_pred").alias("top_lang"),
            (-F.col("pick.negn")).cast("long").alias("top_n"),
        )
    )
    return (
        agg.join(dup, "source")
        .join(lmode, "source")
        .select(
            "source",
            "n_docs",
            F.expr("sumq div n_docs").cast("long").alias("mean_quality"),
            "n_dup_docs",
            "top_lang",
            F.expr("(1000000 * top_n) div n_docs")
            .cast("long")
            .alias("top_lang_share_ppm"),
        )
    )


def source_scorecard_sql(doc_table: str = "documents") -> str:
    """DuckDB twin of :func:`source_scorecard` — composes the
    quality/lang oracles this module already mirrors."""
    quality = (
        "SELECT doc_id, GREATEST(0, 100 "
        "- LEAST(40, (n_punct * 100) // GREATEST(n_chars, 1)) "
        "- LEAST(30, (n_digits * 100) // GREATEST(n_chars, 1)) "
        "- CASE WHEN n_tokens < 10 THEN 30 ELSE 0 END) AS quality FROM "
        "(SELECT doc_id, length(text) AS n_chars, "
        "CASE WHEN trim(text) = '' THEN 0 ELSE "
        "length(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens, "
        "length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))"
        " AS n_punct, "
        "length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))"
        f" AS n_digits FROM {doc_table})"
    )
    return (
        f"WITH q AS ({quality}), "
        f"l AS ({lang_id_sql(doc_table)}), "
        f"fp AS (SELECT doc_id, source, md5({_NORM}) AS fprint"
        f" FROM {doc_table}), "
        "gs AS (SELECT fprint, COUNT(*) AS gsz FROM fp GROUP BY fprint), "
        "dup AS (SELECT f.source, CAST(SUM(CASE WHEN gs.gsz >= 2 THEN 1"
        " ELSE 0 END) AS BIGINT) AS n_dup_docs FROM fp f"
        " JOIN gs ON gs.fprint = f.fprint GROUP BY f.source), "
        f"base AS (SELECT doc_id, source FROM {doc_table}), "
        "agg AS (SELECT b.source, CAST(COUNT(*) AS BIGINT) AS n_docs,"
        " CAST(SUM(q.quality) AS BIGINT) AS sumq FROM base b"
        " JOIN q ON q.doc_id = b.doc_id GROUP BY b.source), "
        "lc AS (SELECT b.source, l.lang_pred, CAST(COUNT(*) AS BIGINT)"
        " AS n FROM base b JOIN l ON l.doc_id = b.doc_id"
        " GROUP BY b.source, l.lang_pred), "
        "lm AS (SELECT source, lang_pred, n FROM (SELECT source,"
        " lang_pred, n, ROW_NUMBER() OVER (PARTITION BY source"
        " ORDER BY n DESC, lang_pred) AS rn FROM lc) WHERE rn = 1) "
        "SELECT a.source, a.n_docs,"
        " CAST(a.sumq // a.n_docs AS BIGINT) AS mean_quality,"
        " dup.n_dup_docs, lm.lang_pred AS top_lang,"
        " CAST((1000000 * lm.n) // a.n_docs AS BIGINT)"
        " AS top_lang_share_ppm"
        " FROM agg a JOIN dup ON dup.source = a.source"
        " JOIN lm ON lm.source = a.source"
    )
