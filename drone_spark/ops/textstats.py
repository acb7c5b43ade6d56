"""Text analysis operators for a web-corpus training pipeline.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM
codegen; zero Python) so they stream through a 100 TB documents scan at
full columnar speed. Language-ID is the one heuristic kernel that
benefits from vectorized pandas; it is Arrow-batched.

Definitions are deliberately expressible in ANSI-ish SQL so the DuckDB
oracle can replay them exactly (``__spark_entry__.py``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

# one canonical whitespace-normalization used by every operator
def norm_text(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


# DuckDB twin of norm_text — the ONE oracle-side normalizer string;
# every generated oracle (lang_id, vocab_topk, dedup._SQL_NORM) must
# reference this so Spark/SQL normalizer parity has a single source.
NORM_SQL = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"


def token_count(col) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(c), r"\s+"))
    )


def bpe_ish_token_count(col) -> Column:
    """Sub-word-ish token count: split on whitespace AND on
    letter/digit/punctuation boundaries (a cheap BPE proxy — counts the
    segments a byte-pair tokenizer would start from)."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.split(F.trim(c), r"\s+|(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])|(?<=[\w])(?=[^\w\s])|(?<=[^\w\s])(?=[\w])")
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(pieces))


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality statistics, all JVM-side:

    n_chars, n_tokens, avg token length, punctuation count, digit
    count, uppercase count — the raw signals of a fastText-style
    quality filter, kept as exact integers so SQL oracles hash-match.
    """
    t = F.col(text_col)
    n_tokens = token_count(text_col)
    return docs.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (F.length(t) - F.length(F.regexp_replace(t, r"[.,;:!?]", ""))).alias("n_punct"),
        (F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))).alias("n_digits"),
        (F.length(t) - F.length(F.regexp_replace(t, r"[A-Z]", ""))).alias("n_upper"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite 0..100 quality score from the stats (integer math so the
    DuckDB oracle reproduces it bit-for-bit):

    score = 100 - penalty(punct-heavy) - penalty(digit-heavy)
                - penalty(too short) capped at 0.

    floor() everywhere (not cast) so Spark and the DuckDB oracle agree
    bit-for-bit — Spark's double→long cast truncates, DuckDB's rounds."""
    s = text_stats(docs, text_col)
    punct_pen = F.least(
        F.lit(40).cast("long"),
        F.floor(F.col("n_punct") * 100 / F.greatest(F.col("n_chars"), F.lit(1))),
    )
    digit_pen = F.least(
        F.lit(30).cast("long"),
        F.floor(F.col("n_digits") * 100 / F.greatest(F.col("n_chars"), F.lit(1))),
    )
    short_pen = F.when(F.col("n_tokens") < 10, F.lit(30)).otherwise(F.lit(0))
    return s.select(
        "doc_id",
        F.greatest(
            F.lit(0).cast("long"),
            F.lit(100) - punct_pen - digit_pen - short_pen,
        ).cast("long").alias("quality"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowercased text (md5 matches across Spark/DuckDB/Python)."""
    return docs.select(
        "doc_id", F.md5(norm_text(text_col)).alias("fingerprint")
    )


# ---------------------------------------------------------------------------
# language identification — stopword/character n-gram heuristic
# ---------------------------------------------------------------------------
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    # tiny public-knowledge stopword lists; the point is the Spark
    # plumbing (Arrow batch scoring), not linguistic accuracy
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr": ("le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour"),
    "es": ("el", "la", "los", "de", "que", "y", "en", "un", "por", "con"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "就", "不", "人"),
}


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax over per-language marker-token hit
    counts (with multiplicity), 'und' when nothing matches; ties break
    in ``_LANG_MARKERS`` declaration order.

    Pure JVM expressions — tokenize once with ``split``, count each
    language's markers with an array ``filter`` (whole-stage codegen, no
    Python anywhere in the plan), argmax via ``greatest`` + a CASE
    chain. The same formulation is ANSI-SQL-expressible, so the DuckDB
    oracle replays it exactly (lang_id_sql below)."""
    toks = F.split(norm_text(text_col), " ")

    def marker_count(markers: tuple[str, ...]):
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    scores = {lang: marker_count(markers) for lang, markers in _LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    pred = F.when(best <= 0, F.lit("und"))
    for lang in _LANG_MARKERS:  # first max in declaration order wins
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return docs.select("doc_id", pred.alias("lang_pred"))


def lang_id_sql(doc_table: str = "documents", norm_sql: str | None = None) -> str:
    """DuckDB mirror of :func:`lang_id` (textual twin of the Spark plan)."""
    norm = norm_sql or NORM_SQL
    score_exprs = []
    for lang, markers in _LANG_MARKERS.items():
        lst = ", ".join(f"'{m}'" for m in markers)
        score_exprs.append(
            f"len(list_filter(string_split(nt, ' '), t -> t IN ({lst}))) AS s_{lang}"
        )
    best = "GREATEST(" + ", ".join(f"s_{lang}" for lang in _LANG_MARKERS) + ")"
    case = "CASE WHEN " + best + " <= 0 THEN 'und' "
    for lang in _LANG_MARKERS:
        case += f"WHEN s_{lang} = {best} THEN '{lang}' "
    case += "END"
    return (
        f"WITH norm AS (SELECT doc_id, {norm} AS nt FROM {doc_table}), "
        "scored AS (SELECT doc_id, " + ", ".join(score_exprs) + " FROM norm) "
        f"SELECT doc_id, {case} AS lang_pred FROM scored"
    )


def vocab_topk(docs: DataFrame, k: int = 100, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary head: the ``k`` most frequent whitespace
    tokens → (token, n, rank). The frequency histogram every curation
    pipeline builds (stopword discovery, boilerplate detection,
    tokenizer-vocab seeding). Pure JVM: explode → groupBy token →
    count, with Catalyst's partial aggregation doing the map-side
    combine, so the shuffle carries one row per distinct token per map
    partition — not one per occurrence. The top-k itself is
    ``orderBy().limit(k)`` → TakeOrderedAndProject (per-partition heap
    + driver merge of k rows), NOT a global sort of the vocabulary;
    the rank window then runs over ≤k rows. Ties rank
    deterministically by token (DuckDB twin: vocab_topk_sql)."""
    from pyspark.sql import Window

    counts = (
        docs.select(F.explode(F.split(norm_text(text_col), " ")).alias("token"))
        .where(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(k)
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "token", "n", "rank"
    )


def vocab_topk_sql(k: int = 100, doc_table: str = "documents") -> str:
    """DuckDB twin of :func:`vocab_topk`."""
    return (
        f"WITH norm AS (SELECT {NORM_SQL} AS nt FROM {doc_table}), "
        "toks AS (SELECT UNNEST(string_split(nt, ' ')) AS token FROM norm), "
        "counts AS (SELECT token, COUNT(*) AS n FROM toks "
        "WHERE length(token) > 0 GROUP BY token), "
        "ranked AS (SELECT token, n, ROW_NUMBER() OVER "
        "(ORDER BY n DESC, token) AS rank FROM counts) "
        f"SELECT token, n, rank FROM ranked WHERE rank <= {k}"
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 ranked retrieval: top-k documents for a bag-of-terms query
    (Robertson & Zaragoza 2009, the idf form with +1 so scores stay
    positive). The IR primitive a corpus-curation stack uses for
    seed-query mining and relevance filtering.

    Plan: one explode over the shared normalizer → per-doc term
    frequencies and doc lengths (both partial-agg map-side combined);
    the query side is a ≤|q|-term broadcast; scoring is pure codegen
    arithmetic; ranking is TakeOrderedAndProject. Two corpus scalars
    (N, avgdl) come from one tiny aggregate job. Scores are rounded to
    6 decimals so the ≤|q|-term per-doc sums are stable across
    summation orders/engines; ties rank by doc id.
    """
    toks = (
        docs.select(
            F.col(id_col).alias("did"),
            F.explode(F.split(norm_text(text_col), " ")).alias("token"),
        )
        .where(F.length("token") > 0)
    )
    tf = toks.groupBy("did", "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("did").agg(F.count(F.lit(1)).alias("dl"))
    n_docs = docs.count()
    return _bm25_rank(tf, dl, query_terms, n_docs, k, k1, b, id_col)


def _bm25_rank(
    tf: DataFrame,
    dl: DataFrame,
    query_terms: list[str],
    n_docs: int,
    k: int,
    k1: float,
    b: float,
    id_col: str,
) -> DataFrame:
    """Shared BM25 scoring over (did, token, tf) + (did, dl) — the
    direct path (:func:`bm25_topk`) and the index-serving path
    (:func:`bm25_from_postings`) both rank through this single
    expression tree, so their results are identical by construction."""
    if n_docs == 0:
        raise ValueError(
            "bm25 ranking over an empty corpus: n_docs == 0 — the idf "
            "and avgdl terms are undefined (same guard style as "
            "similarity.infer_dim)"
        )
    avgdl = dl.agg(F.avg("dl")).collect()[0][0]
    if avgdl in (None, 0):
        raise ValueError(
            "bm25 ranking over a corpus with no tokens: avgdl is "
            f"{avgdl!r} — every document normalized to empty text"
        )
    spark = tf.sparkSession
    qt = spark.createDataFrame([(t,) for t in query_terms], "token string")
    dfreq = (
        tf.join(F.broadcast(qt), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm_len = F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(float(avgdl))
    term_score = idf * (
        F.col("tf") * (k1 + 1.0) / (F.col("tf") + F.lit(k1) * norm_len)
    )
    return (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, "did")
        .groupBy("did")
        .agg(F.round(F.sum(term_score), 6).alias("score"))
        .select(F.col("did").alias(id_col), "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def bm25_from_postings(
    postings: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    n_docs: int | None = None,
) -> DataFrame:
    """BM25 top-k served from the materialized postings index — the
    deployment path :func:`build_postings`'s docstring promises: index
    once, answer every query without re-tokenizing the corpus.

    Doc lengths are recovered from the index itself (``Σ tf`` per doc
    — exact, since postings carry every token), so a query touches
    ONLY the postings table. With a token-bucketed postings table the
    query-term filter prunes to |q| buckets before any shuffle.

    ``n_docs`` defaults to the index's distinct doc count; documents
    whose text normalizes to zero tokens are invisible to the index,
    so pass the true corpus cardinality when such docs exist and exact
    :func:`bm25_topk` parity matters (they differ only in the idf N).
    """
    tf = postings.select(
        F.col(id_col).alias("did"), "token", "tf"
    )
    dl = tf.groupBy("did").agg(F.sum("tf").alias("dl"))
    if n_docs is None:
        n_docs = dl.count()
    return _bm25_rank(tf, dl, query_terms, n_docs, k, k1, b, id_col)


def bm25_topk_sql(
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    doc_table: str = "documents",
) -> str:
    """DuckDB twin of :func:`bm25_topk` (same normalizer, same idf
    form, same 6-decimal score rounding and id tiebreak)."""
    lst = ", ".join(f"'{t}'" for t in query_terms)
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table}), "
        "toks AS (SELECT doc_id, UNNEST(string_split(nt, ' ')) AS token"
        " FROM norm), "
        "toks2 AS (SELECT * FROM toks WHERE length(token) > 0), "
        "tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks2"
        " GROUP BY doc_id, token), "
        "dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks2 GROUP BY doc_id), "
        "stats AS (SELECT (SELECT COUNT(*) FROM"
        f" {doc_table}) AS n, AVG(dl) AS avgdl FROM dl), "
        f"q AS (SELECT UNNEST(ARRAY[{lst}]) AS token), "
        "dfreq AS (SELECT tf.token, COUNT(*) AS df FROM tf JOIN q USING"
        " (token) GROUP BY tf.token) "
        "SELECT tf.doc_id, ROUND(SUM("
        "ln(1.0 + (CAST(s.n AS DOUBLE) - dfreq.df + 0.5) / (dfreq.df + 0.5))"
        f" * (tf.tf * ({k1} + 1.0) / (tf.tf + {k1} * (1.0 - {b} + {b} *"
        " dl.dl / s.avgdl)))), 6) AS score "
        "FROM tf JOIN dfreq ON tf.token = dfreq.token "
        "JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s "
        "GROUP BY tf.doc_id "
        f"ORDER BY score DESC, tf.doc_id LIMIT {k}"
    )


def build_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Inverted-index postings: (token, doc_id, tf, positions) with
    0-based token positions sorted ascending — the indexing twin of
    :func:`bm25_topk` (which recomputes tf on the fly; a real
    deployment materializes THIS table once, bucketed by token, and
    serves both retrieval and phrase queries from it).

    Pure codegen: posexplode carries positions for free; collect_list
    + sort_array restores deterministic position order after the
    shuffle. Partial aggregation combines map-side, so the exchange
    carries one row per (token, doc) per map partition."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(norm_text(text_col), " ")).alias("pos", "token"),
    ).where(F.length("token") > 0)
    return toks.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )


def build_postings_sql(doc_table: str = "documents") -> str:
    """DuckDB twin of :func:`build_postings`. Positions come from an
    indexed ``list_transform`` lambda (1-based) minus 1 — this DuckDB
    lacks WITH ORDINALITY. The split keeps empty tokens' indices,
    matching Spark's posexplode numbering only because the normalizer
    collapses whitespace runs to single spaces first — both engines
    then see identical token sequences."""
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table}), "
        "toks AS (SELECT doc_id, "
        "UNNEST(list_transform(string_split(nt, ' '), "
        "(x, i) -> {'token': x, 'pos': i}), recursive := true) FROM norm), "
        "toks2 AS (SELECT doc_id, token, CAST(pos - 1 AS INTEGER) AS pos"
        " FROM toks WHERE length(token) > 0) "
        "SELECT token, doc_id, COUNT(*) AS tf, "
        "list_sort(list(pos)) AS positions "
        "FROM toks2 GROUP BY token, doc_id"
    )


def phrase_docs(
    docs: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Documents containing ``phrase`` as consecutive tokens, with the
    occurrence count — the positional-index query :func:`build_postings`
    exists to serve. Fold over the phrase: keep the start positions
    whose k-th successor position carries the k-th term; one postings
    row per (term, doc) means the whole phrase join touches at most
    |phrase| rows per candidate document.

    Pure codegen: higher-order ``filter``/``array_contains`` on the
    position arrays — no explode of positions, no Python."""
    post = build_postings(docs, text_col=text_col, id_col=id_col)
    return phrase_docs_from_postings(post, phrase, id_col=id_col)


def phrase_docs_from_postings(
    post: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Phrase search served from the materialized postings index (the
    same fold as :func:`phrase_docs`, which builds a throwaway index
    first — a deployment calls THIS over the stored, token-bucketed
    table: each phrase term prunes to one bucket, |phrase| rows per
    candidate doc total)."""
    if len(phrase) < 2:
        raise ValueError("phrase needs >= 2 terms")
    acc = (
        post.where(F.col("token") == phrase[0])
        .select("doc_id", F.col("positions").alias("starts"))
    )
    def _succ(col_name: str, step: int):
        return lambda x: F.array_contains(F.col(col_name), x + step)

    for k, term in enumerate(phrase[1:], start=1):
        nxt = post.where(F.col("token") == term).select(
            "doc_id", F.col("positions").alias(f"p{k}")
        )
        acc = acc.join(nxt, "doc_id").select(
            "doc_id",
            F.filter("starts", _succ(f"p{k}", k)).alias("starts"),
        ).where(F.size("starts") > 0)
    return acc.select(
        F.col("doc_id").alias(id_col),
        F.size("starts").alias("n_occurrences"),
    )


def phrase_docs_sql(phrase: list[str], doc_table: str = "documents") -> str:
    """DuckDB twin of :func:`phrase_docs` over the same postings CTE."""
    post = build_postings_sql(doc_table)
    # wrap the postings query as a CTE and fold the phrase in SQL
    joins = []
    filt = "a0.positions"
    for k in range(1, len(phrase)):
        joins.append(
            f"JOIN post a{k} ON a{k}.doc_id = a0.doc_id"
            f" AND a{k}.token = '{phrase[k]}'"
        )
        filt = (
            f"list_filter({filt}, x -> list_contains(a{k}.positions, x + {k}))"
        )
    return (
        f"WITH post AS MATERIALIZED ({post}) "
        f"SELECT a0.doc_id, len({filt}) AS n_occurrences "
        f"FROM post a0 {' '.join(joins)} "
        f"WHERE a0.token = '{phrase[0]}' AND len({filt}) > 0"
    )


# ---------------------------------------------------------------------------
# PII redaction — corpus scrubbing before training
# ---------------------------------------------------------------------------
# Patterns restricted to the syntax Java regex (Spark) and RE2 (DuckDB)
# agree on: character classes, bounded repetition, non-capturing groups —
# no backrefs, no lookaround. The structural scrubbing pass every
# training-data pipeline runs; swap/extend patterns per policy.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "phone": (r"\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{4}", "[PHONE]"),
    "ip": (r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}", "[IP]"),
}


def redact_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Count and redact emails / phone numbers / IPv4 addresses:
    returns (id, n_emails, n_phones, n_ips, redacted). Pure codegen
    (regexp_count + chained regexp_replace) — no Python, no shuffle; at
    100 TB this is a map-only pass that pipelines with the scan.
    Replacement order is email → phone → ip (the patterns are mutually
    non-overlapping on their match sets, so order only matters for the
    reader)."""
    red = F.col(text_col)
    counts = []
    for name, (pat, rep) in PII_PATTERNS.items():
        counts.append(F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}s"))
        red = F.regexp_replace(red, pat, rep.replace("$", "\\$"))
    return docs.select(F.col(id_col), *counts, red.alias("redacted"))


def redact_pii_sql(text_expr: str, id_expr: str = "doc_id") -> str:
    """DuckDB twin of :func:`redact_pii` over ``text_expr`` (RE2 'g'
    flag = replace-all, matching Spark's always-global replace;
    len(regexp_extract_all) = regexp_count)."""
    counts = []
    red = text_expr
    for name, (pat, rep) in PII_PATTERNS.items():
        sql_pat = pat.replace("'", "''")
        counts.append(
            f"len(regexp_extract_all({text_expr}, '{sql_pat}')) AS n_{name}s"
        )
        red = f"regexp_replace({red}, '{sql_pat}', '{rep}', 'g')"
    return (
        f"SELECT {id_expr}, " + ", ".join(counts) + f", {red} AS redacted"
    )


def _ngram_array(lcol: Column, n: int) -> Column:
    """Word n-grams of a token array as a new array column — built
    entirely inside the array domain (transform + element_at), so
    n-gram construction never explodes rows or shuffles."""
    if n == 1:
        return lcol
    idx = F.sequence(F.lit(1), F.size(lcol) - (n - 1))

    def gram(i):
        out = F.element_at(lcol, i)
        for j in range(1, n):
            out = F.concat(out, F.lit(" "), F.element_at(lcol, i + j))
        return out

    return F.when(F.size(lcol) < n, F.array().cast("array<string>")).otherwise(
        F.transform(idx, gram)
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, §A1.1), exact
    integer basis points so the DuckDB oracle hash-matches bit-for-bit
    (quality_score's floor-division convention):

    - ``n_toks`` — whitespace tokens after the shared normalizer;
    - ``top_tok_bp`` — frequency of the most common token in basis
      points of ``n_toks``;
    - ``dup2_bp`` / ``dup3_bp`` — duplicate word-n-gram fraction:
      occurrences beyond the first, ``(n − distinct)·10⁴ div n``.

    Scale shape: the dup fractions never leave the array domain
    (``size − size(array_distinct)`` per row) — a map-only pass that
    pipelines with the documents scan, zero shuffle and zero row
    explosion. Only the most-common-token statistic needs an explode +
    two-level partial agg on ``doc_id``. Documents with blank text
    still get a row (all-zero stats)."""
    nt = norm_text(text_col)
    lcol = F.when(nt == "", F.array().cast("array<string>")).otherwise(
        F.split(nt, " ")
    )
    d = docs.select(F.col(id_col).alias("doc_id"), lcol.alias("l"))

    def counts(n: int, prefix: str) -> list[Column]:
        g = _ngram_array(F.col("l"), n)
        return [
            F.size(g).cast("long").alias(f"n_{prefix}"),
            F.size(F.array_distinct(g)).cast("long").alias(f"d_{prefix}"),
        ]

    base = d.select(
        "doc_id",
        F.size("l").cast("long").alias("n_toks"),
        *counts(2, "g2"),
        *counts(3, "g3"),
    )
    top = (
        d.select("doc_id", F.explode("l").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"))
    )
    return (
        base.join(top, "doc_id", "left")
        .withColumn("top_c", F.coalesce("top_c", F.lit(0)).cast("long"))
        .selectExpr(
            "doc_id",
            "n_toks",
            "CASE WHEN n_toks <= 0 THEN 0L"
            " ELSE (top_c * 10000L) div n_toks END AS top_tok_bp",
            "CASE WHEN n_g2 <= 0 THEN 0L"
            " ELSE ((n_g2 - d_g2) * 10000L) div n_g2 END AS dup2_bp",
            "CASE WHEN n_g3 <= 0 THEN 0L"
            " ELSE ((n_g3 - d_g3) * 10000L) div n_g3 END AS dup3_bp",
        )
    )


def repetition_stats_sql(doc_table: str = "documents") -> str:
    """DuckDB twin of :func:`repetition_stats` — n-grams via indexed
    ``list_transform`` lambdas over ``list_slice`` (the
    build_postings_sql pattern), dup fractions via ``list_distinct``,
    floor division via ``//`` on BIGINT-cast counts."""
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table}), "
        "arr AS (SELECT doc_id, CASE WHEN nt = '' THEN CAST([] AS VARCHAR[]) "
        "ELSE string_split(nt, ' ') END AS l FROM norm), "
        "grams AS (SELECT doc_id, l, "
        "list_transform(list_slice(l, 1, length(l) - 1), "
        "(x, i) -> x || ' ' || l[i + 1]) AS g2, "
        "list_transform(list_slice(l, 1, length(l) - 2), "
        "(x, i) -> x || ' ' || l[i + 1] || ' ' || l[i + 2]) AS g3 FROM arr), "
        "base AS (SELECT doc_id, CAST(length(l) AS BIGINT) AS n_toks, "
        "CAST(length(g2) AS BIGINT) AS n_g2, "
        "CAST(length(list_distinct(g2)) AS BIGINT) AS d_g2, "
        "CAST(length(g3) AS BIGINT) AS n_g3, "
        "CAST(length(list_distinct(g3)) AS BIGINT) AS d_g3 FROM grams), "
        "top AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_c FROM ("
        "SELECT doc_id, tok, COUNT(*) AS c FROM ("
        "SELECT doc_id, unnest(l) AS tok FROM arr) GROUP BY doc_id, tok"
        ") GROUP BY doc_id) "
        "SELECT b.doc_id, b.n_toks, "
        "CASE WHEN b.n_toks <= 0 THEN 0 "
        "ELSE (COALESCE(t.top_c, 0) * 10000) // b.n_toks END AS top_tok_bp, "
        "CASE WHEN b.n_g2 <= 0 THEN 0 "
        "ELSE ((b.n_g2 - b.d_g2) * 10000) // b.n_g2 END AS dup2_bp, "
        "CASE WHEN b.n_g3 <= 0 THEN 0 "
        "ELSE ((b.n_g3 - b.d_g3) * 10000) // b.n_g3 END AS dup3_bp "
        "FROM base b LEFT JOIN top t ON t.doc_id = b.doc_id"
    )


def boilerplate_stats(
    docs: DataFrame,
    n: int = 4,
    min_df: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document boilerplate fraction (the C4/CCNet-style
    corpus-level repetition filter): a word ``n``-gram is *boilerplate*
    when it occurs in ≥ ``min_df`` distinct documents (nav bars, footer
    chrome, license blurbs); each document reports how much of it is
    made of such shingles.

    Output: (doc_id, n_shingles, boiler_bp) — distinct n-grams in the
    doc and the basis-point fraction of them that are boilerplate
    (floor division, hash-exact; repetition_stats conventions).

    Scale shape: shingles are deduped *inside the array domain* before
    the explode (array_distinct), so the exploded relation has one row
    per (doc, distinct shingle); document frequency is then a single
    partial-agg count on the shingle key — there is never a doc×doc
    join, and hot boilerplate shingles cost one combiner row per map
    partition, not a pair blowup."""
    nt = norm_text(text_col)
    lcol = F.when(nt == "", F.array().cast("array<string>")).otherwise(
        F.split(nt, " ")
    )
    d = docs.select(F.col(id_col).alias("doc_id"), lcol.alias("l"))
    doc_shingles = d.select(
        "doc_id",
        F.explode(F.array_distinct(_ngram_array(F.col("l"), n))).alias("sh"),
    )
    df_tab = doc_shingles.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    flagged = (
        doc_shingles.join(df_tab, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df") >= min_df, 1).otherwise(0)).alias("n_boiler"),
        )
    )
    base = d.select("doc_id")
    return (
        base.join(flagged, "doc_id", "left")
        .withColumn("n_shingles", F.coalesce("n_shingles", F.lit(0)).cast("long"))
        .withColumn("n_boiler", F.coalesce("n_boiler", F.lit(0)).cast("long"))
        .selectExpr(
            "doc_id",
            "n_shingles",
            "CASE WHEN n_shingles <= 0 THEN 0L"
            " ELSE (n_boiler * 10000L) div n_shingles END AS boiler_bp",
        )
    )


def boilerplate_stats_sql(
    n: int = 4, min_df: int = 3, doc_table: str = "documents"
) -> str:
    """DuckDB twin of :func:`boilerplate_stats` (list_transform n-grams
    + list_distinct, then relational df-count — the
    repetition_stats_sql patterns)."""
    concat = " || ' ' || ".join(
        "x" if j == 0 else f"l[i + {j}]" for j in range(n)
    )
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table}), "
        "arr AS (SELECT doc_id, CASE WHEN nt = '' THEN CAST([] AS VARCHAR[]) "
        "ELSE string_split(nt, ' ') END AS l FROM norm), "
        "ds AS (SELECT doc_id, unnest(list_distinct("
        f"list_transform(list_slice(l, 1, length(l) - {n - 1}), "
        f"(x, i) -> {concat}))) AS sh FROM arr), "
        "dftab AS (SELECT sh, COUNT(*) AS df FROM ds GROUP BY sh), "
        "flagged AS (SELECT ds.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles, "
        f"CAST(SUM(CASE WHEN dftab.df >= {min_df} THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_boiler "
        "FROM ds JOIN dftab ON ds.sh = dftab.sh GROUP BY ds.doc_id) "
        "SELECT d.doc_id, COALESCE(f.n_shingles, 0) AS n_shingles, "
        "CASE WHEN COALESCE(f.n_shingles, 0) <= 0 THEN 0 "
        "ELSE (COALESCE(f.n_boiler, 0) * 10000) // f.n_shingles END AS boiler_bp "
        f"FROM (SELECT doc_id FROM {doc_table}) d "
        "LEFT JOIN flagged f ON f.doc_id = d.doc_id"
    )


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction
# ---------------------------------------------------------------------------
def tfidf_topk(docs: DataFrame, k: int = 5, text_col: str = "text") -> DataFrame:
    """Top-``k`` characteristic terms per document by raw
    tf × (1/df) weighting → (doc_id, token, score_fx, rank).

    score_fx = ⌊10¹²·tf / df⌋ — term frequency over corpus document
    frequency in fixed-point, the rawest form of "term frequency ×
    inverse document frequency". The integer scale keeps ordering and
    values bit-identical across engines (log-smoothed idf would hang
    the hash match on ln() ulp agreement); rank ties break on token.

    Plan shape at scale: (doc, token, tf) by one explode + partial-agg
    groupBy; df by a second partial-agg over the distinct (doc, token)
    pairs (vocabulary-sized, ≪ corpus); score join keyed on token;
    per-doc top-k is a window over each document's OWN tokens — bounded
    by document length, never a global sort."""
    from pyspark.sql import Window

    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(norm_text(text_col), " ")).alias("token"),
        )
        .where(F.length("token") > 0)
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df, "token").select(
        "doc_id",
        "token",
        F.expr("(tf * 1000000000000L) div df").alias("score_fx"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_fx"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "token", "score_fx", "rank")
    )


def tfidf_topk_sql(k: int = 5, doc_table: str = "documents") -> str:
    """DuckDB twin of :func:`tfidf_topk`."""
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table}), "
        "toks AS (SELECT doc_id, UNNEST(string_split(nt, ' ')) AS token "
        "FROM norm), "
        "tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks "
        "WHERE length(token) > 0 GROUP BY doc_id, token), "
        "df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token), "
        "scored AS (SELECT tf.doc_id, tf.token, "
        "CAST((tf.tf * 1000000000000) // df.df AS BIGINT) AS score_fx "
        "FROM tf JOIN df ON tf.token = df.token), "
        "ranked AS (SELECT doc_id, token, score_fx, ROW_NUMBER() OVER "
        "(PARTITION BY doc_id ORDER BY score_fx DESC, token) AS rank "
        "FROM scored) "
        "SELECT doc_id, token, score_fx, CAST(rank AS BIGINT) AS rank "
        f"FROM ranked WHERE rank <= {k}"
    )


# ---------------------------------------------------------------------------
# bigram novelty — corpus-LM rarity as a quality/novelty signal
# ---------------------------------------------------------------------------
def bigram_novelty(
    docs: DataFrame, rare_df: int = 1, text_col: str = "text"
) -> DataFrame:
    """Per-document share of corpus-rare bigrams →
    (doc_id, n_bigrams, n_rare, rare_ppm).

    The integer stand-in for bigram-LM perplexity filtering: a bigram
    is "rare" when its corpus document frequency is ≤ ``rare_df``
    (df over distinct docs, so a doc repeating its own bigram doesn't
    deflate its novelty). rare_ppm = ⌊10⁶·n_rare / n_bigrams⌋; docs
    with < 2 tokens have no bigrams and report 0/0/0. High rare_ppm =
    novel or noisy text (OCR garble scores high too — compose with
    quality_score); near-0 = boilerplate assembled from corpus-common
    transitions.

    Plan: one explode per doc position (posexplode over the token
    array), adjacent-pair bigram by self-zip inside the array (no
    join), partial-agg df over distinct (doc, bigram), then a
    broadcast-free join back keyed on bigram. All JVM codegen."""
    t = F.split(norm_text(text_col), " ")
    bigrams = (
        docs.select(
            "doc_id",
            F.explode(
                F.when(
                    F.size(t) >= 2,
                    F.zip_with(
                        F.slice(t, 1, F.size(t) - 1),
                        F.slice(t, 2, F.size(t) - 1),
                        lambda a, b: F.concat_ws(" ", a, b),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("bigram"),
        )
    )
    per_doc = bigrams.groupBy("doc_id", "bigram").agg(
        F.count(F.lit(1)).alias("n")
    )
    dfreq = per_doc.groupBy("bigram").agg(F.count(F.lit(1)).alias("df"))
    stats = (
        per_doc.join(dfreq, "bigram")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_bigrams"),
            F.sum(F.when(F.col("df") <= rare_df, F.col("n")).otherwise(0))
            .alias("n_rare"),
        )
    )
    return (
        docs.select("doc_id")
        .join(stats, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("n_rare", F.lit(0)).cast("long").alias("n_rare"),
            F.expr(
                "CASE WHEN coalesce(n_bigrams, 0L) <= 0 THEN 0L "
                "ELSE (1000000 * n_rare) div n_bigrams END"
            ).cast("long").alias("rare_ppm"),
        )
    )


def bigram_novelty_sql(rare_df: int = 1, doc_table: str = "documents") -> str:
    """DuckDB twin of :func:`bigram_novelty`."""
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table}), "
        "toks AS (SELECT doc_id, string_split(nt, ' ') AS t FROM norm), "
        "bg AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram "
        "FROM (SELECT doc_id, t, generate_subscripts(t, 1) AS i FROM toks) "
        "WHERE len(t) >= 2 AND i <= len(t) - 1), "
        "per_doc AS (SELECT doc_id, bigram, COUNT(*) AS n FROM bg "
        "GROUP BY doc_id, bigram), "
        "dfreq AS (SELECT bigram, COUNT(*) AS df FROM per_doc GROUP BY bigram), "
        "stats AS (SELECT p.doc_id, SUM(p.n) AS n_bigrams, "
        f"SUM(CASE WHEN d.df <= {rare_df} THEN p.n ELSE 0 END) AS n_rare "
        "FROM per_doc p JOIN dfreq d ON p.bigram = d.bigram "
        "GROUP BY p.doc_id) "
        "SELECT dd.doc_id, CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams, "
        "CAST(COALESCE(s.n_rare, 0) AS BIGINT) AS n_rare, "
        "CAST(CASE WHEN COALESCE(s.n_bigrams, 0) <= 0 THEN 0 "
        "ELSE (1000000 * s.n_rare) // s.n_bigrams END AS BIGINT) AS rare_ppm "
        f"FROM (SELECT doc_id FROM {doc_table}) dd "
        "LEFT JOIN stats s ON s.doc_id = dd.doc_id"
    )


# ---------------------------------------------------------------------------
# winnowing fingerprints (Schleimer-Wilkerson-Aiken 2003, the MOSS
# algorithm) — position-robust document fingerprint selection
# ---------------------------------------------------------------------------
def winnow_fingerprints(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    text_col: str = "text",
    salt: str = "wn0",
) -> DataFrame:
    """Winnowing: from each sliding window of ``w`` consecutive token
    ``k``-gram hashes, select the RIGHTMOST minimal hash → distinct
    (doc_id, pos, fp). Guarantees any shared run of ≥ w+k−1 tokens
    between two documents yields at least one shared fingerprint,
    while keeping ~2/(w+1) of positions — the classic local, alignment-
    robust alternative to full-shingle dedup (SIGMOD'03, used by MOSS).

    All hashes are md5-derived (the oracle-checkable idiom shared with
    ops/dedup.py), so selection is bit-identical across engines; pos
    is the 1-based k-gram index in the normalized token stream. Docs
    shorter than w+k−1 tokens emit nothing (no full window exists —
    the paper's contract).

    Plan: one posexplode per k-gram, window min over the w-row frame
    (partitioned BY DOCUMENT, ordered by pos — state is one doc's
    grams, never global), then a bounded ±w self-join to locate the
    rightmost minimal position per window, and a final distinct. All
    JVM codegen; the per-doc window parallelizes across docs, which is
    the corpus axis."""
    from pyspark.sql import Window

    toks = F.split(norm_text(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )
    g = (
        docs.where(F.size(toks) >= k + w - 1)
        .select("doc_id", F.posexplode(grams).alias("pos0", "gram"))
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            F.conv(
                F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col("gram"))), 1, 15),
                16, 10,
            ).cast("long").alias("h"),
        )
    )
    frame = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    )
    wins = (
        g.withColumn("m", F.min("h").over(frame))
        .withColumn("n_in", F.count("h").over(frame))
        .where(F.col("n_in") == w)  # full windows only
        .select("doc_id", F.col("pos").alias("j"), "m")
    )
    sel = (
        wins.join(g, "doc_id")
        .where(
            (F.col("pos") >= F.col("j"))
            & (F.col("pos") <= F.col("j") + w - 1)
            & (F.col("h") == F.col("m"))
        )
        .groupBy("doc_id", "j", "m")
        .agg(F.max("pos").alias("pos"))
    )
    return (
        sel.select("doc_id", "pos", F.col("m").alias("fp"))
        .distinct()
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "fp")
    )


def winnow_fingerprints_sql(
    k: int = 3, w: int = 4, salt: str = "wn0", doc_table: str = "documents"
) -> str:
    """DuckDB twin of :func:`winnow_fingerprints`."""
    gram = " || ' ' || ".join(f"t[i+{j}]" for j in range(k))
    h = f"('0x' || substr(md5('{salt}:' || gram), 1, 15))::BIGINT"
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table}), "
        "toks AS (SELECT doc_id, string_split(nt, ' ') AS t FROM norm "
        f"WHERE len(string_split(nt, ' ')) >= {k + w - 1}), "
        "grams AS (SELECT doc_id, i AS pos, "
        f"{gram} AS gram "
        "FROM (SELECT doc_id, t, generate_subscripts(t, 1) AS i FROM toks) "
        f"WHERE i <= len(t) - {k - 1}), "
        f"g AS (SELECT doc_id, pos, {h} AS h FROM grams), "
        "wins AS (SELECT doc_id, pos AS j, "
        f"MIN(h) OVER (PARTITION BY doc_id ORDER BY pos "
        f"ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS m, "
        f"COUNT(h) OVER (PARTITION BY doc_id ORDER BY pos "
        f"ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS n_in "
        "FROM g), "
        "sel AS (SELECT wi.doc_id, wi.j, wi.m, MAX(g.pos) AS pos "
        "FROM (SELECT * FROM wins WHERE n_in = " + str(w) + ") wi "
        "JOIN g ON g.doc_id = wi.doc_id AND g.pos BETWEEN wi.j AND wi.j + "
        f"{w - 1} AND g.h = wi.m GROUP BY wi.doc_id, wi.j, wi.m) "
        "SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos, m AS fp FROM sel"
    )


# ---------------------------------------------------------------------------
# co-occurrence lift — integer-exact PMI surrogate over pair counts
# ---------------------------------------------------------------------------
def cooccurrence_lift(
    pairs: DataFrame,
    a_col: str = "center",
    b_col: str = "context",
    min_count: int = 2,
    count_col: str | None = None,
) -> DataFrame:
    """Association scoring over a co-occurrence pair corpus (skip-gram
    pairs from walks, query-click pairs, anchor co-mentions):
    lift_ppm = ⌊10⁶ · N·c(a,b) / (c(a)·c(b))⌋ where N is the total
    pair count and c(·) marginal counts — exp(PMI) in exact fixed
    point (log-PMI itself would hang cross-engine equality on ln()
    ulps; lift is the same ranking). Returns
    (a, b, n_ab, lift_ppm) for pairs with n_ab ≥ ``min_count``.

    ``count_col``: pass the count column of a pre-aggregated pair
    table (e.g. skipgram_pairs' ``n_pairs``); ``None`` counts raw
    pair events.

    Arithmetic runs in DECIMAL(38,0), exact to N·c_ab ≤ 10³⁸ (beyond
    any real corpus; DuckDB's HUGEINT path is identical).

    Plan: two partial-agg marginals (vocabulary-sized) + one pair agg,
    then two joins keyed on the marginals — no shuffle wider than the
    pair table itself; N is one scalar read."""
    cnt = (F.count(F.lit(1)) if count_col is None
           else F.sum(count_col))
    pc = pairs.groupBy(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).agg(cnt.alias("n_ab"))
    ca = pairs.groupBy(F.col(a_col).alias("a")).agg(cnt.alias("n_a"))
    cb = pairs.groupBy(F.col(b_col).alias("b")).agg(cnt.alias("n_b"))
    n = (pairs.count() if count_col is None
         else pairs.agg(F.sum(count_col)).first()[0])
    return (
        pc.where(F.col("n_ab") >= min_count)
        .join(ca, "a")
        .join(cb, "b")
        .select(
            "a",
            "b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.expr(
                f"CAST((CAST({10**6 * n} AS DECIMAL(38,0)) * n_ab) DIV "
                "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )


def bpe_merge_pairs(docs: DataFrame, k: int = 20, text_col: str = "text") -> DataFrame:
    """First-round BPE merge candidates: adjacent character-pair
    frequencies over the corpus, weighted by token frequency — exactly
    the statistic byte-pair-encoding tokenizer training maximizes at
    each merge step (Sennrich et al., ACL 2016). Returns the top-k
    (pair, cnt) by count (ties on pair).

    Scale shape: the pair explosion runs over the *distinct-token
    frequency table*, not the raw token stream — at 100 TB the
    vocabulary is ~10^7 rows while occurrences are ~10^13, so weighting
    by the pre-aggregated count collapses the hot loop six orders of
    magnitude before any explode. Everything is JVM lambda/\
    higher-order functions (``transform(sequence(...))``); the DuckDB
    twin mirrors it with list_transform/generate_series."""
    tok_counts = (
        docs.select(F.explode(F.split(norm_text(text_col), " ")).alias("tok"))
        .where(F.length("tok") >= 2)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pairs = tok_counts.select(
        "cnt",
        F.explode(
            F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(k)
    )


def bpe_merge_pairs_sql(k: int = 20, doc_table: str = "documents") -> str:
    """DuckDB twin of :func:`bpe_merge_pairs`."""
    return (
        f"WITH norm AS (SELECT {NORM_SQL} AS nt FROM {doc_table}), "
        "toks AS (SELECT unnest(string_split(nt, ' ')) AS tok FROM norm), "
        "tc AS (SELECT tok, COUNT(*) AS cnt FROM toks "
        "WHERE length(tok) >= 2 GROUP BY tok), "
        "pairs AS (SELECT unnest(list_transform(generate_series(1, length(tok) - 1), "
        "i -> substr(tok, i, 2))) AS pair, cnt FROM tc) "
        "SELECT pair, CAST(SUM(cnt) AS BIGINT) AS cnt FROM pairs "
        f"GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT {k}"
    )


def lm_dirichlet_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    mu: float = 2000.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty, SIGIR 2001) — the language-modeling counterpart of
    :func:`bm25_topk`:

        score(q,d) = Σ_{t∈q} ln( (tf_td + μ·c_t/N) / (dl_d + μ) )

    Unlike BM25, every (doc, query-term) pair contributes (smoothing
    gives tf=0 terms mass), so the plan is docs × |q| rows via a
    broadcast cross join with a left join onto the tf table — still
    ≤|q| rows per document, scored in pure codegen. Out-of-vocabulary
    query terms drop (c_t=0 would put ln at −∞), docs normalizing to
    empty text drop with them — both mirrored in the twin. Scores
    round to 6 decimals (the bm25 convention) and tie-break on id."""
    toks = (
        docs.select(
            F.col(id_col).alias("did"),
            F.explode(F.split(norm_text(text_col), " ")).alias("token"),
        )
        .where(F.length("token") > 0)
    )
    tf = toks.groupBy("did", "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("did").agg(F.count(F.lit(1)).alias("dl"))
    n_total = toks.count()
    spark = docs.sparkSession
    qt = spark.createDataFrame([(t,) for t in query_terms], "token string")
    gc = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c_t"))
        .join(F.broadcast(qt), "token")
    )
    grid = dl.crossJoin(F.broadcast(gc))
    term = F.log(
        (
            F.coalesce("tf", F.lit(0))
            + F.lit(mu) * F.col("c_t") / F.lit(float(n_total))
        )
        / (F.col("dl") + F.lit(mu))
    )
    return (
        grid.join(tf, ["did", "token"], "left")
        .groupBy("did")
        .agg(F.round(F.sum(term), 6).alias("score"))
        .select(F.col("did").alias(id_col), "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def lm_dirichlet_topk_sql(
    query_terms: list[str],
    k: int = 20,
    mu: float = 2000.0,
    doc_table: str = "documents",
) -> str:
    """DuckDB twin of :func:`lm_dirichlet_topk`."""
    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table}), "
        "toks AS (SELECT doc_id AS did, unnest(string_split(nt, ' ')) AS token "
        "FROM norm), "
        "tfl AS (SELECT did, token FROM toks WHERE length(token) > 0), "
        "tf AS (SELECT did, token, COUNT(*) AS tf FROM tfl GROUP BY 1, 2), "
        "dl AS (SELECT did, COUNT(*) AS dl FROM tfl GROUP BY did), "
        "nt AS (SELECT COUNT(*) AS n FROM tfl), "
        f"qt AS (SELECT unnest([{terms}]) AS token), "
        "gc AS (SELECT g.token, g.c_t FROM "
        "(SELECT token, COUNT(*) AS c_t FROM tfl GROUP BY token) g "
        "JOIN qt ON g.token = qt.token), "
        "grid AS (SELECT dl.did, dl.dl, gc.token, gc.c_t FROM dl CROSS JOIN gc), "
        "scored AS (SELECT grid.did, ROUND(SUM(LN((COALESCE(tf.tf, 0) + "
        f"{mu} * grid.c_t / CAST(nt.n AS DOUBLE)) / (grid.dl + {mu}))), 6) "
        "AS score FROM grid LEFT JOIN tf ON tf.did = grid.did "
        "AND tf.token = grid.token, nt GROUP BY grid.did) "
        f"SELECT did AS doc_id, score FROM scored "
        f"ORDER BY score DESC, did ASC LIMIT {k}"
    )


def encoding_flags(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document encoding-health counters — the mojibake/corruption
    gate every crawl curation pass runs before tokenization:

    - ``non_ascii``     chars outside 0x00-0x7F
    - ``control``       C0 control chars except tab/newline/CR
    - ``replacement``   U+FFFD replacement chars (a decoder already
                        gave up on these bytes)
    - ``ascii_ppm``     ⌊10⁶·ascii / chars⌋ (10⁶ for empty docs)

    Counting is length-minus-stripped (one regexp_replace per class,
    chars not bytes — identical in Spark and DuckDB's UTF-8 length).
    Legit non-Latin text scores high non_ascii but zero
    control/replacement — the two must gate differently downstream.
    Pure codegen, no Python. Result: (doc_id, n_chars, non_ascii,
    control, replacement, ascii_ppm)."""
    t = F.col(text_col)

    def stripped(pattern: str):
        return F.length(t) - F.length(F.regexp_replace(t, pattern, ""))

    non_ascii = stripped(r"[^\x00-\x7F]")
    control = stripped(r"[\x00-\x08\x0B\x0C\x0E-\x1F]")
    replacement = stripped("�")
    base = docs.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars"),
        non_ascii.cast("long").alias("non_ascii"),
        control.cast("long").alias("control"),
        replacement.cast("long").alias("replacement"),
    )
    return base.select(
        "doc_id",
        "n_chars",
        "non_ascii",
        "control",
        "replacement",
        F.when(F.col("n_chars") == 0, F.lit(1_000_000))
        .otherwise(
            F.expr("(1000000 * (n_chars - non_ascii)) div n_chars")
        )
        .cast("long")
        .alias("ascii_ppm"),
    )


def encoding_flags_sql(doc_table: str = "documents") -> str:
    """DuckDB twin of :func:`encoding_flags`."""
    na = r"length(text) - length(regexp_replace(text, '[^\x00-\x7F]', '', 'g'))"
    ctl = (
        r"length(text) - length(regexp_replace(text, "
        r"'[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g'))"
    )
    rep = "length(text) - length(replace(text, chr(65533), ''))"
    return (
        f"SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, "
        f"CAST({na} AS BIGINT) AS non_ascii, "
        f"CAST({ctl} AS BIGINT) AS control, "
        f"CAST({rep} AS BIGINT) AS replacement, "
        "CAST(CASE WHEN length(text) = 0 THEN 1000000 ELSE "
        f"(1000000 * (length(text) - ({na}))) // length(text) END AS BIGINT) "
        f"AS ascii_ppm FROM {doc_table}"
    )


def char_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document character-level Shannon entropy in micro-nats:
    H = Σ_c (n_c/N)·ln(N/n_c), computed as Σ n_c·⌊10⁶·ln(N/n_c)⌋ DIV N
    (the host_entropy/surprisal integer convention — floor per class,
    then exact integer weighted mean). Near-zero entropy = one-glyph
    padding/repetition junk; natural text sits ~3.0e6 µnats. The
    character-distribution complement to the token-level
    quality/surprisal gates.

    Pure relational: one explode to (doc, char) via split(''),
    one groupBy for class counts, one ln on the (doc, class) table —
    bounded by alphabet size per doc — and one weighted sum.
    Result: (doc_id, n_chars, entropy_micro); empty docs report 0."""
    chars = (
        docs.select(
            "doc_id", F.explode(F.split(text_col, "")).alias("ch")
        )
        .where(F.length("ch") > 0)
    )
    counts = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).alias("n_c")
    )
    totals = counts.groupBy("doc_id").agg(F.sum("n_c").alias("n"))
    scored = counts.join(totals, "doc_id").select(
        "doc_id",
        "n_c",
        "n",
        F.floor(
            F.lit(1_000_000)
            * F.log(F.col("n").cast("double") / F.col("n_c"))
        )
        .cast("long")
        .alias("s_micro"),
    )
    ent = scored.groupBy("doc_id").agg(
        F.max("n").cast("long").alias("n_chars"),
        F.expr("sum(n_c * s_micro) DIV max(n)").cast("long").alias(
            "entropy_micro"
        ),
    )
    return (
        docs.select("doc_id")
        .join(ent, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_chars", F.lit(0)).cast("long").alias("n_chars"),
            F.coalesce("entropy_micro", F.lit(0))
            .cast("long")
            .alias("entropy_micro"),
        )
    )


def char_entropy_sql(doc_table: str = "documents") -> str:
    """DuckDB twin of :func:`char_entropy`. DuckDB's
    string_split(text, '') yields the same per-character list as
    Spark's split on the empty pattern."""
    return (
        "WITH chars AS (SELECT doc_id, ch FROM (SELECT doc_id, "
        f"UNNEST(string_split(text, '')) AS ch FROM {doc_table}) "
        "WHERE length(ch) > 0), "
        "counts AS (SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS n_c "
        "FROM chars GROUP BY doc_id, ch), "
        "totals AS (SELECT doc_id, CAST(SUM(n_c) AS BIGINT) AS n "
        "FROM counts GROUP BY doc_id), "
        "scored AS (SELECT c.doc_id, c.n_c, t.n, "
        "CAST(FLOOR(1000000 * LN(CAST(t.n AS DOUBLE) / c.n_c)) AS BIGINT) "
        "AS s_micro FROM counts c JOIN totals t ON t.doc_id = c.doc_id), "
        "ent AS (SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_chars, "
        "CAST(SUM(n_c * s_micro) // MAX(n) AS BIGINT) AS entropy_micro "
        "FROM scored GROUP BY doc_id) "
        "SELECT d.doc_id, CAST(COALESCE(e.n_chars, 0) AS BIGINT) AS n_chars, "
        "CAST(COALESCE(e.entropy_micro, 0) AS BIGINT) AS entropy_micro "
        f"FROM {doc_table} d LEFT JOIN ent e ON e.doc_id = d.doc_id"
    )


def readability(docs: DataFrame, long_len: int = 7) -> DataFrame:
    """Per-document readability panel: Flesch reading ease plus the
    lexical terms it is built from, all in exact integer fixed point.
    On web text the Flesch score is the standard pre-training quality
    gate ("drop score < 30 legalese / keep 60-80 prose"); the lexical
    columns (mean word length, long-word share, syllables-per-word)
    are the LIX/RIX family terms and stay meaningful even on corpora
    with no sentence punctuation (sentence count floors at 1, so the
    whole doc reads as one sentence — deterministic, and on real
    crawl text the [.!?]+ runs give true sentence counts).

    Definitions (ints; ⌊·⌋ = integer DIV, identical in Spark and
    DuckDB on non-negative operands):
      n_words  = whitespace tokens of trim(text)
      n_sent   = max(1, #runs of [.!?]+)
      n_syll   = max(1, #runs of [aeiouy]+ in lower(text)) — the
                 classic vowel-group syllable proxy
      avg_wlen_milli      = 1000·Σ len(token) DIV max(1, n_words)
      long_pct            = 100·#{len(token) ≥ long_len} DIV max(1, n_words)
      syll_per_word_micro = 10⁶·n_syll DIV max(1, n_words)
      flesch_milli        = 206835 − 1015·n_words DIV n_sent
                            − 84600·n_syll DIV max(1, n_words)

    One projection over the documents scan — no shuffle, no UDF;
    every expression is JVM codegen (regexp_count / split /
    higher-order filter), so it streams at columnar scan speed at
    100 TB. Result: (doc_id, n_words, n_sent, n_syll, avg_wlen_milli,
    long_pct, syll_per_word_micro, flesch_milli)."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    nw = token_count("text")
    nw1 = F.greatest(F.lit(1), nw)
    ns = F.greatest(
        F.lit(1), F.regexp_count(F.col("text"), F.lit(r"[.!?]+"))
    ).cast("long")
    syl = F.greatest(
        F.lit(1),
        F.regexp_count(F.lower(F.col("text")), F.lit(r"[aeiouy]+")),
    ).cast("long")
    # Σ token length == chars left after deleting ALL whitespace
    letters = F.length(F.regexp_replace(F.trim(F.col("text")), r"\s+", ""))
    nlong = F.size(F.filter(toks, lambda t: F.length(t) >= long_len))
    return docs.select(
        "doc_id",
        nw.cast("long").alias("n_words"),
        ns.alias("n_sent"),
        syl.alias("n_syll"),
        (F.lit(1000) * letters).cast("long").alias("_lm"),
        nw1.cast("long").alias("_nw1"),
        (F.lit(100) * nlong).cast("long").alias("_lg"),
        (F.lit(1_000_000) * syl).cast("long").alias("_sy"),
    ).select(
        "doc_id",
        "n_words",
        "n_sent",
        "n_syll",
        F.expr("_lm DIV _nw1").alias("avg_wlen_milli"),
        F.expr("_lg DIV _nw1").alias("long_pct"),
        F.expr("_sy DIV _nw1").alias("syll_per_word_micro"),
        (
            F.lit(206_835)
            - F.expr("(1015 * n_words) DIV n_sent")
            - F.expr("(84600 * n_syll) DIV _nw1")
        )
        .cast("long")
        .alias("flesch_milli"),
    )


def readability_sql(long_len: int = 7, doc_table: str = "documents") -> str:
    """DuckDB twin of :func:`readability`."""
    return (
        "WITH base AS (SELECT doc_id, "
        "CASE WHEN trim(text) = '' THEN 0 ELSE "
        "len(regexp_split_to_array(trim(text), '\\s+')) END AS nw, "
        "GREATEST(1, len(regexp_extract_all(text, '[.!?]+'))) AS ns, "
        "GREATEST(1, len(regexp_extract_all(lower(text), '[aeiouy]+'))) "
        "AS syl, "
        "length(regexp_replace(trim(text), '\\s+', '', 'g')) AS letters, "
        "len(list_filter(regexp_split_to_array(trim(text), '\\s+'), "
        f"t -> length(t) >= {long_len})) AS nlong "
        f"FROM {doc_table}) "
        "SELECT doc_id, CAST(nw AS BIGINT) AS n_words, "
        "CAST(ns AS BIGINT) AS n_sent, CAST(syl AS BIGINT) AS n_syll, "
        "CAST(1000 * letters // GREATEST(1, nw) AS BIGINT) "
        "AS avg_wlen_milli, "
        "CAST(100 * nlong // GREATEST(1, nw) AS BIGINT) AS long_pct, "
        "CAST(1000000 * syl // GREATEST(1, nw) AS BIGINT) "
        "AS syll_per_word_micro, "
        "CAST(206835 - (1015 * nw) // ns "
        "- (84600 * syl) // GREATEST(1, nw) AS BIGINT) AS flesch_milli "
        "FROM base"
    )


# Gopher/MassiveText repetition-free quality rule set (Rae et al. 2021,
# table A1 subset that is exact-integer checkable): the five rules and
# their thresholds are public constants; the stopword probe list is the
# paper's ("the","be","to","of","and","that","have","with") — presence
# of ≥ 2 distinct ones signals real running text.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Per-document Gopher-style quality rule flags, all integer/bool
    exact (no float thresholds — the mean-word-length band 3..10 is
    checked by cross-multiplication: 3·n ≤ Σlen ≤ 10·n):

      r_wordcount   min_words ≤ n_words ≤ max_words
      r_meanlen     3 ≤ mean word length ≤ 10
      r_alpha       ≥ 80% of words contain an alphabetic char
                    (5·n_alpha_words ≥ 4·n_words)
      r_stopwords   ≥ 2 distinct probe stopwords present
      passed        all four

    One scan, pure codegen array ops — the filter tier a 100 TB
    pretraining pipeline runs before any model-based scoring.

    Result: (doc_id, n_words, r_wordcount, r_meanlen, r_alpha,
    r_stopwords, passed)."""
    toks = docs.select(
        "doc_id", F.split(norm_text(text_col), " ").alias("w")
    ).select(
        "doc_id",
        "w",
        F.size("w").alias("n_words"),
        F.expr(
            "aggregate(w, 0L, (acc, x) -> acc + length(x))"
        ).alias("sum_len"),
        F.expr(
            "size(filter(w, x -> x rlike '[a-z]'))"
        ).alias("n_alpha_words"),
        F.expr(
            "size(array_intersect(array_distinct(w), array({})))".format(
                ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
            )
        ).alias("n_stop"),
    )
    return toks.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        (
            (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
        ).alias("r_wordcount"),
        (
            (F.lit(3) * F.col("n_words") <= F.col("sum_len"))
            & (F.col("sum_len") <= F.lit(10) * F.col("n_words"))
        ).alias("r_meanlen"),
        (F.lit(5) * F.col("n_alpha_words") >= F.lit(4) * F.col("n_words"))
        .alias("r_alpha"),
        (F.col("n_stop") >= 2).alias("r_stopwords"),
        (
            (F.col("n_words") >= min_words)
            & (F.col("n_words") <= max_words)
            & (F.lit(3) * F.col("n_words") <= F.col("sum_len"))
            & (F.col("sum_len") <= F.lit(10) * F.col("n_words"))
            & (F.lit(5) * F.col("n_alpha_words") >= F.lit(4) * F.col("n_words"))
            & (F.col("n_stop") >= 2)
        ).alias("passed"),
    )


def gopher_rules_sql(
    min_words: int = 50,
    max_words: int = 100_000,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`gopher_rules`."""
    stop = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    return (
        f"WITH toks AS (SELECT doc_id, string_split({NORM_SQL}, ' ') AS w "
        f"FROM {table}), "
        "feats AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words, "
        "CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) "
        "AS sum_len, "
        "CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) "
        "AS BIGINT) AS n_alpha_words, "
        f"CAST(len(list_intersect(list_distinct(w), [{stop}])) AS BIGINT) "
        "AS n_stop FROM toks) "
        "SELECT doc_id, n_words, "
        f"(n_words >= {min_words} AND n_words <= {max_words}) AS r_wordcount, "
        "(3 * n_words <= sum_len AND sum_len <= 10 * n_words) AS r_meanlen, "
        "(5 * n_alpha_words >= 4 * n_words) AS r_alpha, "
        "(n_stop >= 2) AS r_stopwords, "
        f"(n_words >= {min_words} AND n_words <= {max_words} "
        "AND 3 * n_words <= sum_len AND sum_len <= 10 * n_words "
        "AND 5 * n_alpha_words >= 4 * n_words AND n_stop >= 2) AS passed "
        "FROM feats"
    )


def lm_jm_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    lam: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Query-likelihood retrieval with Jelinek-Mercer smoothing (Zhai &
    Lafferty, SIGIR 2001) — the fixed-λ interpolation counterpart of
    :func:`lm_dirichlet_topk` (Dirichlet adapts smoothing to document
    length; JM is the verbosity-insensitive baseline the same paper
    recommends for verbose queries):

        score(q,d) = Σ_{t∈q} ln( (1−λ)·tf_td/dl_d + λ·c_t/N )

    Identical plan shape to the Dirichlet scorer — docs × |q| grid via
    a broadcast cross join, left join onto tf, one codegen aggregate —
    and the same conventions: OOV query terms drop, empty-normalized
    docs drop, scores round to 6 decimals, ties break on id."""
    toks = (
        docs.select(
            F.col(id_col).alias("did"),
            F.explode(F.split(norm_text(text_col), " ")).alias("token"),
        )
        .where(F.length("token") > 0)
    )
    tf = toks.groupBy("did", "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("did").agg(F.count(F.lit(1)).alias("dl"))
    n_total = toks.count()
    spark = docs.sparkSession
    qt = spark.createDataFrame([(t,) for t in query_terms], "token string")
    gc = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c_t"))
        .join(F.broadcast(qt), "token")
    )
    grid = dl.crossJoin(F.broadcast(gc))
    term = F.log(
        F.lit(1.0 - lam) * F.coalesce("tf", F.lit(0)) / F.col("dl")
        + F.lit(lam) * F.col("c_t") / F.lit(float(n_total))
    )
    return (
        grid.join(tf, ["did", "token"], "left")
        .groupBy("did")
        .agg(F.round(F.sum(term), 6).alias("score"))
        .select(F.col("did").alias(id_col), "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def lm_jm_topk_sql(
    query_terms: list[str],
    k: int = 20,
    lam: float = 0.5,
    doc_table: str = "documents",
) -> str:
    """DuckDB twin of :func:`lm_jm_topk`."""
    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table}), "
        "toks AS (SELECT doc_id AS did, unnest(string_split(nt, ' ')) AS token "
        "FROM norm), "
        "tfl AS (SELECT did, token FROM toks WHERE length(token) > 0), "
        "tf AS (SELECT did, token, COUNT(*) AS tf FROM tfl GROUP BY 1, 2), "
        "dl AS (SELECT did, COUNT(*) AS dl FROM tfl GROUP BY did), "
        "nt AS (SELECT COUNT(*) AS n FROM tfl), "
        f"qt AS (SELECT unnest([{terms}]) AS token), "
        "gc AS (SELECT g.token, g.c_t FROM "
        "(SELECT token, COUNT(*) AS c_t FROM tfl GROUP BY token) g "
        "JOIN qt ON g.token = qt.token), "
        "grid AS (SELECT dl.did, dl.dl, gc.token, gc.c_t FROM dl CROSS JOIN gc), "
        f"scored AS (SELECT grid.did, ROUND(SUM(LN({1.0 - lam} * "
        "COALESCE(tf.tf, 0) / grid.dl + "
        f"{lam} * grid.c_t / CAST(nt.n AS DOUBLE))), 6) "
        "AS score FROM grid LEFT JOIN tf ON tf.did = grid.did "
        "AND tf.token = grid.token, nt GROUP BY grid.did) "
        f"SELECT did AS doc_id, score FROM scored "
        f"ORDER BY score DESC, did ASC LIMIT {k}"
    )


def term_proximity(
    docs: DataFrame,
    term_a: str,
    term_b: str,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Minimum positional gap between two query terms per document —
    the proximity feature ranking stacks on top of BM25 (Tao & Zhai,
    SIGIR 2007 show min-distance is the strongest of the proximity
    aggregates). For each document containing BOTH terms, report
    min |pos_a − pos_b| and rank ascending.

    Scale shape: the closest cross-term pair is always ADJACENT in the
    merged position order (anything strictly between an optimal pair
    would itself form a closer pair), so the plan is a per-doc window
    lag over the two terms' position lists — O(tf_a + tf_b) rows per
    document, never the tf_a × tf_b position cross join. Pure codegen:
    posexplode, one window, one min aggregate. Result: (doc_id,
    min_gap, n_a, n_b) top-k by (min_gap asc, doc_id asc)."""
    toks = docs.select(
        F.col(id_col).alias("did"),
        F.posexplode(F.split(norm_text(text_col), " ")).alias("pos", "token"),
    ).where(F.col("token").isin([term_a, term_b]))
    lab = toks.select(
        "did", "pos", (F.col("token") == term_a).cast("int").alias("lab")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("did").orderBy("pos")
    gaps = (
        lab.select(
            "did",
            "pos",
            "lab",
            F.lag("pos").over(w).alias("ppos"),
            F.lag("lab").over(w).alias("plab"),
        )
        .where(F.col("plab").isNotNull() & (F.col("plab") != F.col("lab")))
        .groupBy("did")
        .agg(F.min(F.col("pos") - F.col("ppos")).cast("long").alias("min_gap"))
    )
    counts = lab.groupBy("did").agg(
        F.sum("lab").cast("long").alias("n_a"),
        F.sum(F.lit(1) - F.col("lab")).cast("long").alias("n_b"),
    )
    return (
        gaps.join(counts, "did")
        .select(F.col("did").alias(id_col), "min_gap", "n_a", "n_b")
        .orderBy(F.asc("min_gap"), F.asc(id_col))
        .limit(k)
    )


def term_proximity_sql(
    term_a: str,
    term_b: str,
    k: int = 20,
    doc_table: str = "documents",
) -> str:
    """DuckDB twin of :func:`term_proximity` — same merged-order lag."""
    ta = term_a.replace("'", "''")
    tb = term_b.replace("'", "''")
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table}), "
        "toks0 AS (SELECT doc_id AS did, "
        "UNNEST(list_transform(string_split(nt, ' '), "
        "(x, i) -> {'token': x, 'pos': i}), recursive := true) FROM norm), "
        f"lab AS (SELECT did, CAST(pos - 1 AS BIGINT) AS pos, "
        f"CASE WHEN token = '{ta}' THEN 1 ELSE 0 END AS lab "
        f"FROM toks0 WHERE token IN ('{ta}', '{tb}')), "
        "lagged AS (SELECT did, pos, lab, "
        "LAG(pos) OVER (PARTITION BY did ORDER BY pos) AS ppos, "
        "LAG(lab) OVER (PARTITION BY did ORDER BY pos) AS plab FROM lab), "
        "gaps AS (SELECT did, CAST(MIN(pos - ppos) AS BIGINT) AS min_gap "
        "FROM lagged WHERE plab IS NOT NULL AND plab <> lab GROUP BY did), "
        "counts AS (SELECT did, CAST(SUM(lab) AS BIGINT) AS n_a, "
        "CAST(SUM(1 - lab) AS BIGINT) AS n_b FROM lab GROUP BY did) "
        "SELECT g.did AS doc_id, g.min_gap, c.n_a, c.n_b "
        "FROM gaps g JOIN counts c ON c.did = g.did "
        f"ORDER BY g.min_gap ASC, g.did ASC LIMIT {k}"
    )


def rocchio_terms(
    docs: DataFrame,
    query_terms: list[str],
    k_docs: int = 10,
    k_terms: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rocchio pseudo-relevance expansion (Rocchio 1971; the PRF
    baseline every IR stack ships): take the BM25 top-``k_docs`` for
    the query, average their tf-idf vectors, and emit the
    top-``k_terms`` terms of that centroid — the query-expansion
    candidates. w(t) = Σ_{d∈top} tf_td · ln(N/df_t) / k_docs with
    df/N over the WHOLE corpus (absent terms contribute 0).

    Plan: the bm25_topk ranking (its own broadcast/TakeOrdered shape)
    feeds a semi-join that prunes the tf table to ≤k_docs documents
    before any scoring; df is one corpus aggregate. All inputs to the
    float math are exact integers; weights round to 6, ties break on
    token. Result: (token, df, weight)."""
    topd = bm25_topk(
        docs, query_terms, k=k_docs, text_col=text_col, id_col=id_col
    ).select(F.col(id_col).alias("did"))
    toks = (
        docs.select(
            F.col(id_col).alias("did"),
            F.explode(F.split(norm_text(text_col), " ")).alias("token"),
        )
        .where(F.length("token") > 0)
    )
    n_docs = docs.select(id_col).distinct().count()
    df_t = (
        toks.select("did", "token").distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    tf = (
        toks.join(F.broadcast(topd), "did")
        .groupBy("did", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        tf.join(df_t, "token")
        .groupBy("token", "df")
        .agg(
            F.round(
                F.sum(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")))
                / F.lit(k_docs),
                6,
            ).alias("weight")
        )
        .select("token", F.col("df").cast("long").alias("df"), "weight")
        .orderBy(F.desc("weight"), F.asc("token"))
        .limit(k_terms)
    )


def rocchio_terms_sql(
    query_terms: list[str],
    k_docs: int = 10,
    k_terms: int = 15,
    doc_table: str = "documents",
) -> str:
    """DuckDB twin of :func:`rocchio_terms` (wraps the bm25_topk twin
    as the top-docs CTE)."""
    bm25 = bm25_topk_sql(query_terms, k=k_docs, doc_table=doc_table)
    return (
        f"WITH topd AS MATERIALIZED (SELECT doc_id AS did FROM ({bm25})), "
        f"norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table}), "
        "toks AS (SELECT doc_id AS did, unnest(string_split(nt, ' ')) AS token "
        "FROM norm), "
        "tfl AS (SELECT did, token FROM toks WHERE length(token) > 0), "
        f"nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM {doc_table}), "
        "dft AS (SELECT token, CAST(COUNT(DISTINCT did) AS BIGINT) AS df "
        "FROM tfl GROUP BY token), "
        "tf AS (SELECT t.did, t.token, COUNT(*) AS tf FROM tfl t "
        "JOIN topd ON topd.did = t.did GROUP BY t.did, t.token) "
        "SELECT tf.token, dft.df, "
        f"ROUND(SUM(tf.tf * LN(CAST(nd.n AS DOUBLE) / dft.df)) / {k_docs}, 6) "
        "AS weight FROM tf JOIN dft ON dft.token = tf.token CROSS JOIN nd "
        "GROUP BY tf.token, dft.df "
        f"ORDER BY weight DESC, tf.token ASC LIMIT {k_terms}"
    )


def query_clarity(
    docs: DataFrame,
    query_terms: list[str],
    k_docs: int = 10,
    lam: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Query clarity score (Cronen-Townsend, Zhou & Croft, SIGIR 2002)
    — the pre-retrieval performance predictor: KL divergence between
    the query language model (term distribution of the BM25
    top-``k_docs``, JM-smoothed with weight λ toward the collection)
    and the collection model.

        P(t|q) = λ·cf_t(top)/|top| + (1−λ)·cf_t(C)/|C|
        clarity = Σ_t P(t|q) · log₂( P(t|q) / (cf_t(C)/|C|) )

    High clarity = the result set speaks a focused sub-language (the
    query is answerable); near-zero = the query draws a corpus-random
    sample — the triage signal IR pipelines use before spending on
    reranking. Sum runs over the top-docs' vocabulary (terms with
    P(t|top) > 0), exactly as the paper samples it.

    Plan: the bm25_topk ranking, one semi-joined token aggregate for
    the top-docs model, one corpus aggregate — every float input an
    exact integer count; result rounds to 6. Result: one row
    (n_top_docs, vocab_q, clarity)."""
    topd = bm25_topk(
        docs, query_terms, k=k_docs, text_col=text_col, id_col=id_col
    ).select(F.col(id_col).alias("did"))
    n_top = topd.count()
    toks = (
        docs.select(
            F.col(id_col).alias("did"),
            F.explode(F.split(norm_text(text_col), " ")).alias("token"),
        )
        .where(F.length("token") > 0)
    )
    corpus = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cf"))
    n_corpus = toks.count()
    qtf = (
        toks.join(F.broadcast(topd), "did")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("qf"))
    )
    totals = qtf.agg(F.sum("qf").alias("nq"))
    pq = (
        qtf.join(corpus, "token")
        .crossJoin(F.broadcast(totals))
        .select(
            "token",
            (
                F.lit(lam) * F.col("qf") / F.col("nq")
                + F.lit(1.0 - lam) * F.col("cf") / F.lit(float(n_corpus))
            ).alias("p_q"),
            (F.col("cf") / F.lit(float(n_corpus))).alias("p_c"),
        )
    )
    return pq.agg(
        F.lit(n_top).cast("long").alias("n_top_docs"),
        F.count(F.lit(1)).cast("long").alias("vocab_q"),
        F.round(
            F.sum(F.col("p_q") * F.log2(F.col("p_q") / F.col("p_c"))), 6
        ).alias("clarity"),
    )


def query_clarity_sql(
    query_terms: list[str],
    k_docs: int = 10,
    lam: float = 0.6,
    doc_table: str = "documents",
) -> str:
    """DuckDB twin of :func:`query_clarity`."""
    bm25 = bm25_topk_sql(query_terms, k=k_docs, doc_table=doc_table)
    return (
        f"WITH topd AS MATERIALIZED (SELECT doc_id AS did FROM ({bm25})), "
        f"norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table}), "
        "toks AS (SELECT doc_id AS did, unnest(string_split(nt, ' ')) AS token "
        "FROM norm), "
        "tfl AS (SELECT did, token FROM toks WHERE length(token) > 0), "
        "corpus AS (SELECT token, COUNT(*) AS cf FROM tfl GROUP BY token), "
        "nc AS (SELECT COUNT(*) AS n FROM tfl), "
        "qtf AS (SELECT t.token, COUNT(*) AS qf FROM tfl t "
        "JOIN topd ON topd.did = t.did GROUP BY t.token), "
        "nq AS (SELECT SUM(qf) AS nq FROM qtf), "
        "ntop AS (SELECT COUNT(*) AS n FROM topd), "
        "pq AS (SELECT q.token, "
        f"{lam} * q.qf / nq.nq + {1.0 - lam} * c.cf / CAST(nc.n AS DOUBLE) "
        "AS p_q, c.cf / CAST(nc.n AS DOUBLE) AS p_c "
        "FROM qtf q JOIN corpus c ON c.token = q.token "
        "CROSS JOIN nq CROSS JOIN nc) "
        "SELECT CAST(ntop.n AS BIGINT) AS n_top_docs, "
        "CAST(COUNT(*) AS BIGINT) AS vocab_q, "
        "ROUND(SUM(p_q * LOG2(p_q / p_c)), 6) AS clarity "
        "FROM pq CROSS JOIN ntop GROUP BY ntop.n"
    )


def bm25f_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    head_len: int = 10,
    head_weight: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25F fielded ranking (Zaragoza, Craswell, Taylor, Saria &
    Robertson, TREC 2004; the simplified single-b form) — the web-search
    upgrade of BM25: term hits in the document HEAD (title/lede — here
    the first ``head_len`` tokens, which is what a crawl pipeline has
    before structural extraction) count ``head_weight``× a body hit,
    via field-weighted pseudo-frequencies

        t̃f(t,d) = w_head·tf_head + tf_body,   d̃l = w_head·|head| + |body|

    then the usual saturation t̃f/(k1·(1−b+b·d̃l/avgdl) + t̃f) with the
    same +1-idf as :func:`bm25_topk` (df is field-blind, the standard
    choice). Integer weights keep t̃f/d̃l exact across engines; scores
    round to 6, ties rank by id. Same plan family as bm25_topk: one
    posexplode, weighted partial aggs, broadcast query side."""
    toks = docs.select(
        F.col(id_col).alias("did"),
        F.posexplode(F.split(norm_text(text_col), " ")).alias("pos", "token"),
    ).where(F.length("token") > 0)
    wtoks = toks.select(
        "did",
        "token",
        F.when(F.col("pos") < head_len, F.lit(head_weight))
        .otherwise(F.lit(1))
        .alias("w"),
    )
    tf = wtoks.groupBy("did", "token").agg(F.sum("w").alias("wtf"))
    dl = wtoks.groupBy("did").agg(F.sum("w").alias("wdl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.avg("wdl").alias("avgdl")
    )
    spark = docs.sparkSession
    qt = spark.createDataFrame([(t,) for t in query_terms], "token string")
    dfreq = (
        toks.select("did", "token").distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(F.broadcast(qt), "token")
    )
    idf = F.log(
        1.0
        + (F.col("n").cast("double") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    sat = (F.col("wtf") * (F.lit(k1) + 1.0)) / (
        F.col("wtf")
        + F.lit(k1)
        * (1.0 - F.lit(b) + F.lit(b) * F.col("wdl") / F.col("avgdl"))
    )
    return (
        tf.join(dfreq, "token")
        .join(dl, "did")
        .crossJoin(F.broadcast(stats))
        .groupBy("did")
        .agg(F.round(F.sum(idf * sat), 6).alias("score"))
        .select(F.col("did").alias(id_col), "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def bm25f_topk_sql(
    query_terms: list[str],
    k: int = 10,
    head_len: int = 10,
    head_weight: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    doc_table: str = "documents",
) -> str:
    """DuckDB twin of :func:`bm25f_topk`."""
    lst = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table}), "
        "toks0 AS (SELECT doc_id AS did, "
        "UNNEST(list_transform(string_split(nt, ' '), "
        "(x, i) -> {'token': x, 'pos': i}), recursive := true) FROM norm), "
        "toks AS (SELECT did, token, pos - 1 AS pos FROM toks0 "
        "WHERE length(token) > 0), "
        f"wtoks AS (SELECT did, token, CASE WHEN pos < {head_len} "
        f"THEN {head_weight} ELSE 1 END AS w FROM toks), "
        "tf AS (SELECT did, token, CAST(SUM(w) AS BIGINT) AS wtf "
        "FROM wtoks GROUP BY did, token), "
        "dl AS (SELECT did, CAST(SUM(w) AS BIGINT) AS wdl "
        "FROM wtoks GROUP BY did), "
        "stats AS (SELECT COUNT(*) AS n, AVG(wdl) AS avgdl FROM dl), "
        f"q AS (SELECT UNNEST([{lst}]) AS token), "
        "dfreq AS (SELECT t.token, COUNT(DISTINCT t.did) AS df "
        "FROM toks t JOIN q ON q.token = t.token GROUP BY t.token) "
        "SELECT tf.did AS doc_id, ROUND(SUM("
        "LN(1.0 + (CAST(s.n AS DOUBLE) - dfreq.df + 0.5) / (dfreq.df + 0.5)) "
        f"* (tf.wtf * ({k1} + 1.0) / (tf.wtf + {k1} * (1.0 - {b} + {b} * "
        "dl.wdl / s.avgdl)))), 6) AS score "
        "FROM tf JOIN dfreq ON dfreq.token = tf.token "
        "JOIN dl ON dl.did = tf.did CROSS JOIN stats s "
        "GROUP BY tf.did "
        f"ORDER BY score DESC, doc_id ASC LIMIT {k}"
    )


def lang_mismatch(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-label contamination audit: documents whose heuristic
    language ID disagrees with their declared ``lang`` column — the
    curation gate that catches feed mislabeling, wholesale boilerplate
    in the wrong language, and crawl redirects serving a different
    locale (every multilingual-corpus pipeline runs exactly this
    cross-check before per-language sampling). Reuses :func:`lang_id`
    (pure-codegen marker argmax), one join back onto the labels, and a
    per-(declared, predicted) rollup.

    Result: the confusion rollup (lang, lang_pred, n_docs) over
    DISAGREEING rows only, plus the per-pair min doc_id as an audit
    sample pointer — exact integers, deterministic."""
    pred = lang_id(docs, text_col=text_col)
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .where(F.col("lang") != F.col("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("sample_doc_id"),
        )
    )


def lang_mismatch_sql(doc_table: str = "documents") -> str:
    """DuckDB twin of :func:`lang_mismatch`."""
    inner = lang_id_sql(doc_table)
    return (
        f"WITH pred AS MATERIALIZED (SELECT * FROM ({inner})) "
        f"SELECT d.lang, p.lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(MIN(d.doc_id) AS BIGINT) AS sample_doc_id "
        f"FROM {doc_table} d JOIN pred p ON p.doc_id = d.doc_id "
        "WHERE d.lang <> p.lang_pred GROUP BY d.lang, p.lang_pred"
    )


def nqc_predictor(
    docs: DataFrame,
    query_terms: list[str],
    k_docs: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """NQC post-retrieval query-performance predictor (Shtok, Kurland
    & Carmel, ICTIR 2009): the normalized standard deviation of the
    top-k retrieval scores — high score variance among the top results
    predicts an effective query (a few documents clearly win), flat
    scores predict a floundering one. Complements :func:`query_clarity`
    (the language-model predictor) with the score-distribution view:

        NQC = sqrt( Σ (s_i − s̄)² / k ) / s̄

    over the BM25 top-k scores (already round-6, so the ≤k-term float
    stats are engine-stable; NQC rounds to 6, s̄ > 0 guarded). Result:
    one row (k_used, mean_score, nqc)."""
    top = bm25_topk(
        docs, query_terms, k=k_docs, text_col=text_col, id_col=id_col
    )
    return top.agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.round(F.avg("score"), 6).alias("mean_score"),
        F.round(
            F.sqrt(F.var_pop("score")) / F.avg("score"), 6
        ).alias("nqc"),
    )


def nqc_predictor_sql(
    query_terms: list[str],
    k_docs: int = 10,
    doc_table: str = "documents",
) -> str:
    """DuckDB twin of :func:`nqc_predictor`."""
    bm25 = bm25_topk_sql(query_terms, k=k_docs, doc_table=doc_table)
    return (
        f"WITH top AS MATERIALIZED (SELECT score FROM ({bm25})) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS k_used, "
        "ROUND(AVG(score), 6) AS mean_score, "
        "ROUND(SQRT(VAR_POP(score)) / AVG(score), 6) AS nqc FROM top"
    )


def maxscore_prunable(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MaxScore prunability audit (Turtle & Flood 1995; the
    upper-bound machinery behind WAND/BMW index traversal): with
    per-term score upper bounds U_t = max over docs of the term's BM25
    contribution, a candidate document d (≥1 query term) can be
    skipped without scoring iff Σ_{t ∈ q ∩ d} U_t < θ, where θ is the
    current k-th best full score. This measures what fraction of the
    postings a bound-aware traversal never scores — the number that
    justifies (or doesn't) impact-ordered index layouts for a query
    load. Per-term contributions and θ reuse the exact bm25_topk
    arithmetic (round-6 contributions, so the ≤|q|-term bound sums are
    engine-stable). Result: one row (theta, n_candidates, n_prunable,
    prunable_ppm)."""
    toks = (
        docs.select(
            F.col(id_col).alias("did"),
            F.explode(F.split(norm_text(text_col), " ")).alias("token"),
        )
        .where(F.length("token") > 0)
    )
    tf = toks.groupBy("did", "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("did").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"))
    spark = docs.sparkSession
    qt = spark.createDataFrame([(t,) for t in query_terms], "token string")
    dfreq = (
        tf.join(F.broadcast(qt), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = F.log(
        1.0
        + (F.col("n").cast("double") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = F.round(
        idf
        * (
            F.col("tf") * (F.lit(k1) + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (1.0 - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            )
        ),
        6,
    )
    scored = (
        tf.join(dfreq, "token")
        .join(dl, "did")
        .crossJoin(F.broadcast(stats))
        .select("did", "token", contrib.alias("c"))
    )
    theta = (
        scored.groupBy("did")
        .agg(F.round(F.sum("c"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("did"))
        .limit(k)
        .agg(F.min("score").alias("theta"))
    )
    ub = scored.groupBy("token").agg(F.max("c").alias("ub"))
    bounds = (
        scored.join(F.broadcast(ub), "token")
        .groupBy("did")
        .agg(F.sum("ub").alias("bound"))
    )
    return bounds.crossJoin(F.broadcast(theta)).agg(
        F.min("theta").alias("theta"),
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.sum((F.col("bound") < F.col("theta")).cast("long"))
        .cast("long")
        .alias("n_prunable"),
        F.floor(
            F.lit(1_000_000)
            * F.sum((F.col("bound") < F.col("theta")).cast("long"))
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("prunable_ppm"),
    )


def maxscore_prunable_sql(
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    doc_table: str = "documents",
) -> str:
    """DuckDB twin of :func:`maxscore_prunable`."""
    lst = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table}), "
        "toks AS (SELECT doc_id AS did, unnest(string_split(nt, ' ')) AS token "
        "FROM norm), "
        "tfl AS (SELECT did, token FROM toks WHERE length(token) > 0), "
        "tf AS (SELECT did, token, COUNT(*) AS tf FROM tfl GROUP BY 1, 2), "
        "dl AS (SELECT did, COUNT(*) AS dl FROM tfl GROUP BY did), "
        "stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl), "
        f"q AS (SELECT UNNEST([{lst}]) AS token), "
        "dfreq AS (SELECT tf.token, COUNT(*) AS df FROM tf "
        "JOIN q USING (token) GROUP BY tf.token), "
        "scored AS (SELECT tf.did, tf.token, ROUND("
        "LN(1.0 + (CAST(s.n AS DOUBLE) - dfreq.df + 0.5) / (dfreq.df + 0.5)) "
        f"* (tf.tf * ({k1} + 1.0) / (tf.tf + {k1} * (1.0 - {b} + {b} * "
        "dl.dl / s.avgdl))), 6) AS c "
        "FROM tf JOIN dfreq ON dfreq.token = tf.token "
        "JOIN dl ON dl.did = tf.did CROSS JOIN stats s), "
        "theta AS (SELECT MIN(score) AS theta FROM ("
        "SELECT did, ROUND(SUM(c), 6) AS score FROM scored GROUP BY did "
        f"ORDER BY score DESC, did ASC LIMIT {k})), "
        "ub AS (SELECT token, MAX(c) AS ub FROM scored GROUP BY token), "
        "bounds AS (SELECT s.did, SUM(ub.ub) AS bound FROM scored s "
        "JOIN ub ON ub.token = s.token GROUP BY s.did) "
        "SELECT MIN(t.theta) AS theta, "
        "CAST(COUNT(*) AS BIGINT) AS n_candidates, "
        "CAST(SUM(CASE WHEN b.bound < t.theta THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_prunable, "
        "CAST(FLOOR(1000000 * SUM(CASE WHEN b.bound < t.theta THEN 1 ELSE 0 "
        "END) / COUNT(*)) AS BIGINT) AS prunable_ppm "
        "FROM bounds b CROSS JOIN theta t"
    )
