"""Corpus-level statistical laws and index-compression estimates.

Web-corpus curation pipelines sanity-check a crawl against the two
classic power laws — Zipf (token frequency vs rank) and Heaps
(vocabulary growth vs tokens seen) — and size their inverted index
from the posting-list delta-gap distribution. PMI pairs surface the
collocations a tokenizer-vocab or stopword pass should know about.
None of these exist in the reference (it ships no text tier at all —
SURVEY §2.3); all four are pure relational plans with exact DuckDB
twins in ``__spark_entry__.py``.

At-scale shape notes:

- ``zipf_slope`` regresses over the TOP-K vocabulary head only, so the
  global ordering is TakeOrderedAndProject (per-partition heap, k rows
  to the driver-side merge) — never a full vocabulary sort. The
  regression itself is one aggregate over ≤k rows.
- ``heaps_law`` needs a global prefix sum in corpus (doc_id) order —
  the classic single-task window trap. Like sampling.pack_bins it runs
  the textbook two-level scan: range-bucketed per-bucket window (all
  buckets in parallel) + an n_buckets-row offset table broadcast back.
  Values are identical to the naive global window (the DuckDB twin IS
  the naive global window, proving it).
- ``posting_gaps`` windows are PARTITIONED by token — per-term state
  only, embarrassingly parallel; hot terms are bounded by the corpus'
  own df. All outputs are exact integers (varint byte estimate uses
  integer CASE thresholds, not float log2) so the oracle hash-matches
  bitwise.
- ``pmi_pairs`` is the canonical pair-blowup op, handled like dedup's
  n-gram pass: df band (min_df, max df share) drops hapaxes and
  stopwords BEFORE the self-join, and a deterministic per-doc cap
  bounds the join at cap² pairs per document. PMI denominators use the
  capped df so the statistic is self-consistent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .textstats import NORM_SQL, norm_text, token_count

ROUND = 6


def _tokens(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(
            "doc_id",
            F.explode(F.split(norm_text(text_col), " ")).alias("token"),
        )
        .where(F.length("token") > 0)
    )


# ---------------------------------------------------------------------------
# Zipf's law
# ---------------------------------------------------------------------------
def zipf_slope(docs: DataFrame, k: int = 1000, text_col: str = "text") -> DataFrame:
    """Least-squares fit of ln(freq) ~ ln(rank) over the top-``k``
    vocabulary head → one row (n_terms, slope, intercept, r2), rounded
    to 6 decimals. A healthy natural-language crawl fits slope ≈ −1;
    spam/boilerplate-heavy shards drift far from it, so this is a
    per-shard corpus-health gate.

    Ranks tie-break by token so both engines rank identically; the
    top-k is TakeOrderedAndProject, the regression one agg over ≤k
    rows (regr_slope/intercept/r2 are built-in on both engines)."""
    counts = (
        _tokens(docs, text_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(k)
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    ranked = top.withColumn("rank", F.row_number().over(w))
    y = F.ln(F.col("n").cast("double"))
    x = F.ln(F.col("rank").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.regr_slope(y, x), ROUND).alias("slope"),
        F.round(F.regr_intercept(y, x), ROUND).alias("intercept"),
        F.round(F.regr_r2(y, x), ROUND).alias("r2"),
    )


def zipf_slope_sql(k: int = 1000, doc_table: str = "documents") -> str:
    """DuckDB twin of :func:`zipf_slope`."""
    return (
        f"WITH norm AS (SELECT {NORM_SQL} AS nt FROM {doc_table}), "
        "toks AS (SELECT UNNEST(string_split(nt, ' ')) AS token FROM norm), "
        "counts AS (SELECT token, COUNT(*) AS n FROM toks "
        "WHERE length(token) > 0 GROUP BY token), "
        "ranked AS (SELECT n, ROW_NUMBER() OVER "
        "(ORDER BY n DESC, token) AS rank FROM counts) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_terms, "
        "ROUND(regr_slope(ln(CAST(n AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6) AS slope, "
        "ROUND(regr_intercept(ln(CAST(n AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6) AS intercept, "
        "ROUND(regr_r2(ln(CAST(n AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6) AS r2 "
        f"FROM ranked WHERE rank <= {k}"
    )


# ---------------------------------------------------------------------------
# Heaps' law
# ---------------------------------------------------------------------------
def heaps_law(
    docs: DataFrame,
    stride: int = 10,
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """Vocabulary-growth curve in corpus (doc_id) order: for every
    ``stride``-th doc_id, (doc_id, cum_tokens, cum_vocab) — total
    tokens and distinct tokens over all docs with id ≤ this one.
    Heaps' law predicts cum_vocab ≈ K·cum_tokensᵝ; a shard whose curve
    flattens early is duplicate-heavy (dedup finds the same shards).

    Per-doc new-vocabulary counts come from each token's
    FIRST-occurrence doc (min doc_id per token) — one groupBy, no
    cross-doc set union. The two prefix sums run as two-level scans:
    doc_ids are range-bucketed into ``n_buckets`` contiguous spans (one
    tiny max(doc_id) scalar job sizes the spans), each span cumsums in
    parallel under a PARTITIONed window, and an n_buckets-row offset
    table is broadcast back — identical values to a naive global
    window at any scale."""
    per_doc = docs.select(
        "doc_id", token_count(text_col).cast("long").alias("tc")
    )
    firsts = (
        _tokens(docs, text_col)
        .groupBy("token")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("nv"))
    )
    joined = per_doc.join(firsts, "doc_id", "left").select(
        "doc_id", "tc", F.coalesce("nv", F.lit(0)).cast("long").alias("nv")
    )
    max_id = joined.agg(F.max("doc_id").alias("m"))
    span = F.col("m") / n_buckets + 1
    keyed = joined.join(F.broadcast(max_id)).withColumn(
        "bucket", (F.col("doc_id") / span).cast("long")
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = keyed.select(
        "doc_id",
        "bucket",
        F.sum("tc").over(w_in).alias("tc_loc"),
        F.sum("nv").over(w_in).alias("nv_loc"),
    )
    totals = keyed.groupBy("bucket").agg(
        F.sum("tc").alias("tc_tot"), F.sum("nv").alias("nv_tot")
    )
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "bucket",
        F.coalesce(F.sum("tc_tot").over(w_b), F.lit(0)).alias("tc_off"),
        F.coalesce(F.sum("nv_tot").over(w_b), F.lit(0)).alias("nv_off"),
    )
    return (
        local.join(F.broadcast(offsets), "bucket")
        .where(F.col("doc_id") % stride == 0)
        .select(
            "doc_id",
            (F.col("tc_off") + F.col("tc_loc")).cast("long").alias("cum_tokens"),
            (F.col("nv_off") + F.col("nv_loc")).cast("long").alias("cum_vocab"),
        )
    )


def heaps_law_sql(stride: int = 10, doc_table: str = "documents") -> str:
    """DuckDB twin of :func:`heaps_law` — the NAIVE single-node global
    window over doc_id order, proving the two-level scan's values."""
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table}), "
        "per_doc AS (SELECT doc_id, CAST(CASE WHEN nt = '' THEN 0 ELSE "
        "length(nt) - length(replace(nt, ' ', '')) + 1 END AS BIGINT) AS tc "
        "FROM norm), "
        "toks AS (SELECT doc_id, UNNEST(string_split(nt, ' ')) AS token "
        "FROM norm), "
        "firsts AS (SELECT MIN(doc_id) AS doc_id FROM toks "
        "WHERE length(token) > 0 GROUP BY token), "
        "nvs AS (SELECT doc_id, COUNT(*) AS nv FROM firsts GROUP BY doc_id), "
        "cum AS (SELECT p.doc_id, "
        "SUM(p.tc) OVER (ORDER BY p.doc_id) AS cum_tokens, "
        "SUM(COALESCE(n.nv, 0)) OVER (ORDER BY p.doc_id) AS cum_vocab "
        "FROM per_doc p LEFT JOIN nvs n ON p.doc_id = n.doc_id) "
        "SELECT doc_id, CAST(cum_tokens AS BIGINT) AS cum_tokens, "
        "CAST(cum_vocab AS BIGINT) AS cum_vocab "
        f"FROM cum WHERE doc_id % {stride} = 0"
    )


# ---------------------------------------------------------------------------
# posting-list delta-gap compression estimate
# ---------------------------------------------------------------------------
def posting_gaps(
    docs: DataFrame, min_df: int = 5, text_col: str = "text"
) -> DataFrame:
    """Per-term posting-list compression profile: for every token with
    document frequency ≥ ``min_df``, the delta-gap statistics of its
    ascending doc_id list — (token, df, sum_gap, max_gap, varint_bytes)
    where varint_bytes is the exact LEB128 byte count of the df−1
    inter-doc gaps. This is how an index builder sizes storage and
    picks block codecs BEFORE writing terabytes of postings.

    The lag window is PARTITIONED by token (per-term state only). The
    varint size uses integer CASE thresholds (128, 128², …) — no float
    log2 — so every output column is an exact integer and the oracle
    hash-matches bitwise."""
    post = (
        _tokens(docs, text_col)
        .select("token", "doc_id")
        .distinct()
    )
    w = Window.partitionBy("token").orderBy("doc_id")
    gaps = post.withColumn(
        "gap", F.col("doc_id") - F.lag("doc_id").over(w)
    )
    g = F.col("gap")
    varint = (
        F.when(g < 128, 1)
        .when(g < 16384, 2)
        .when(g < 2097152, 3)
        .when(g < 268435456, 4)
        .otherwise(5)
    )
    return (
        gaps.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("gap").cast("long").alias("sum_gap"),
            F.max("gap").cast("long").alias("max_gap"),
            F.sum(F.when(g.isNull(), 0).otherwise(varint))
            .cast("long")
            .alias("varint_bytes"),
        )
        .where(F.col("df") >= min_df)
    )


def posting_gaps_sql(min_df: int = 5, doc_table: str = "documents") -> str:
    """DuckDB twin of :func:`posting_gaps`."""
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table}), "
        "post AS (SELECT DISTINCT token, doc_id FROM (SELECT doc_id, "
        "UNNEST(string_split(nt, ' ')) AS token FROM norm) "
        "WHERE length(token) > 0), "
        "gaps AS (SELECT token, doc_id - LAG(doc_id) OVER "
        "(PARTITION BY token ORDER BY doc_id) AS gap FROM post) "
        "SELECT token, CAST(COUNT(*) AS BIGINT) AS df, "
        "CAST(SUM(gap) AS BIGINT) AS sum_gap, "
        "CAST(MAX(gap) AS BIGINT) AS max_gap, "
        "CAST(SUM(CASE WHEN gap IS NULL THEN 0 WHEN gap < 128 THEN 1 "
        "WHEN gap < 16384 THEN 2 WHEN gap < 2097152 THEN 3 "
        "WHEN gap < 268435456 THEN 4 ELSE 5 END) AS BIGINT) AS varint_bytes "
        f"FROM gaps GROUP BY token HAVING COUNT(*) >= {min_df}"
    )


# ---------------------------------------------------------------------------
# PMI collocation pairs
# ---------------------------------------------------------------------------
def pmi_pairs(
    docs: DataFrame,
    min_df: int = 5,
    max_df_den: int = 5,
    per_doc_cap: int = 32,
    min_pair: int = 5,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` document-level collocations by pointwise mutual
    information: pairs of tokens that co-occur in documents far more
    often than their individual frequencies predict → (t1, t2, n12,
    df1, df2, pmi). The collocation pass a tokenizer-vocab or
    stopword-list builder runs over a fresh crawl.

    Pair-blowup control (the same safe-by-default contract as dedup's
    ``max_doc_freq``): tokens outside the df band [``min_df``,
    N/``max_df_den``] never enter the self-join (hapaxes are noise,
    stopwords are the hub keys that explode it), and each document
    contributes only its ``per_doc_cap`` lexicographically-first
    eligible tokens — cap²/2 pairs per doc, a hard bound. PMI
    denominators use the CAPPED document frequencies so the statistic
    is exactly self-consistent with the pair counts. ln runs on
    bit-identical doubles in both engines (exact integer products
    < 2⁵³, one IEEE divide), then rounds to 6; ordering is by the
    ROUNDED pmi with (t1, t2) tie-breaks, so ranking is deterministic
    cross-engine. Top-k is TakeOrderedAndProject."""
    dtok = _tokens(docs, text_col).select("doc_id", "token").distinct()
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df = dtok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    elig = (
        dtok.join(df, "token")
        .join(F.broadcast(n_docs))
        .where(
            (F.col("df") >= min_df) & (F.col("df") * max_df_den <= F.col("n_docs"))
        )
        .select("doc_id", "token")
    )
    w = Window.partitionBy("doc_id").orderBy("token")
    capped = (
        elig.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= per_doc_cap)
        .select("doc_id", "token")
    )
    dfc = capped.groupBy("token").agg(F.count(F.lit(1)).alias("dfc"))
    a = capped.alias("a")
    b = capped.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.token") < F.col("b.token")),
        )
        .groupBy(
            F.col("a.token").alias("t1"), F.col("b.token").alias("t2")
        )
        .agg(F.count(F.lit(1)).alias("n12"))
        .where(F.col("n12") >= min_pair)
    )
    scored = (
        pairs.join(dfc.select(F.col("token").alias("t1"), F.col("dfc").alias("df1")), "t1")
        .join(dfc.select(F.col("token").alias("t2"), F.col("dfc").alias("df2")), "t2")
        .join(F.broadcast(n_docs))
        .select(
            "t1",
            "t2",
            "n12",
            "df1",
            "df2",
            F.round(
                F.ln(
                    (F.col("n_docs") * F.col("n12")).cast("double")
                    / (F.col("df1") * F.col("df2")).cast("double")
                ),
                ROUND,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("t1"), F.asc("t2")).limit(k)


def pmi_pairs_sql(
    min_df: int = 5,
    max_df_den: int = 5,
    per_doc_cap: int = 32,
    min_pair: int = 5,
    k: int = 50,
    doc_table: str = "documents",
) -> str:
    """DuckDB twin of :func:`pmi_pairs`."""
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table}), "
        "dtok AS (SELECT DISTINCT doc_id, token FROM (SELECT doc_id, "
        "UNNEST(string_split(nt, ' ')) AS token FROM norm) "
        "WHERE length(token) > 0), "
        f"nd AS (SELECT COUNT(*) AS n_docs FROM {doc_table}), "
        "dfs AS (SELECT token, COUNT(*) AS df FROM dtok GROUP BY token), "
        "elig AS (SELECT d.doc_id, d.token FROM dtok d JOIN dfs f "
        "ON d.token = f.token, nd "
        f"WHERE f.df >= {min_df} AND f.df * {max_df_den} <= nd.n_docs), "
        "capped AS (SELECT doc_id, token FROM (SELECT doc_id, token, "
        "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY token) AS rn "
        f"FROM elig) WHERE rn <= {per_doc_cap}), "
        "dfc AS (SELECT token, COUNT(*) AS dfc FROM capped GROUP BY token), "
        "pairs AS (SELECT a.token AS t1, b.token AS t2, COUNT(*) AS n12 "
        "FROM capped a JOIN capped b ON a.doc_id = b.doc_id "
        "AND a.token < b.token GROUP BY a.token, b.token "
        f"HAVING COUNT(*) >= {min_pair}), "
        "scored AS (SELECT t1, t2, CAST(n12 AS BIGINT) AS n12, "
        "CAST(f1.dfc AS BIGINT) AS df1, CAST(f2.dfc AS BIGINT) AS df2, "
        "ROUND(ln(CAST(nd.n_docs * n12 AS DOUBLE) / "
        "CAST(f1.dfc * f2.dfc AS DOUBLE)), 6) AS pmi "
        "FROM pairs JOIN dfc f1 ON pairs.t1 = f1.token "
        "JOIN dfc f2 ON pairs.t2 = f2.token, nd) "
        f"SELECT * FROM scored ORDER BY pmi DESC, t1, t2 LIMIT {k}"
    )


# ---------------------------------------------------------------------------
# unigram surprisal / per-source KL — the language-model-free quality
# signals a curation pipeline computes before any model exists
# ---------------------------------------------------------------------------
def unigram_surprisal(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document mean unigram surprisal in micro-nats: the
    self-information of each token under the corpus unigram model,
    FLOOR(1e6·ln(N/c_t)) per token, summed with per-doc multiplicities
    and divided (integer DIV) by the doc's token count. High = rare
    vocabulary (often noise or non-text); low = boilerplate. The
    pre-model twin of LM-perplexity filtering (CCNet-style).

    Scale shape: the only ln runs on the DISTINCT-token table (~10^7
    rows at 100 TB), never the occurrence stream; per-doc totals are
    one integer-weighted join + sum. Integer end-to-end after the
    floored log, so the DuckDB twin hash-matches."""
    toks = docs.select(
        "doc_id",
        F.explode(F.split(norm_text(text_col), " ")).alias("token"),
    ).where(F.length("token") > 0)
    dtc = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c_dt"))
    gc = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c_t"))
    n_total = gc.agg(F.sum("c_t").alias("n"))
    s = gc.crossJoin(F.broadcast(n_total)).select(
        "token",
        F.floor(
            F.lit(1_000_000)
            * F.log(F.col("n").cast("double") / F.col("c_t"))
        ).cast("long").alias("s_micro"),
    )
    return (
        dtc.join(s, "token")
        .groupBy("doc_id")
        .agg(
            F.sum("c_dt").alias("n_tokens"),
            F.sum(F.col("c_dt") * F.col("s_micro")).alias("total"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr("total DIV n_tokens").alias("mean_surprisal_micro"),
        )
    )


def unigram_surprisal_sql(doc_table: str = "documents") -> str:
    """DuckDB twin of :func:`unigram_surprisal`."""
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table}), "
        "toks AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS token FROM norm), "
        "tf AS (SELECT doc_id, token FROM toks WHERE length(token) > 0), "
        "dtc AS (SELECT doc_id, token, COUNT(*) AS c_dt FROM tf GROUP BY 1, 2), "
        "gc AS (SELECT token, COUNT(*) AS c_t FROM tf GROUP BY token), "
        "nt AS (SELECT CAST(SUM(c_t) AS BIGINT) AS n FROM gc), "
        "s AS (SELECT token, CAST(FLOOR(1000000 * LN(CAST(n AS DOUBLE) / c_t)) "
        "AS BIGINT) AS s_micro FROM gc, nt) "
        "SELECT dtc.doc_id, CAST(SUM(c_dt) AS BIGINT) AS n_tokens, "
        "CAST(SUM(c_dt * s_micro) // SUM(c_dt) AS BIGINT) AS mean_surprisal_micro "
        "FROM dtc JOIN s ON dtc.token = s.token GROUP BY dtc.doc_id"
    )


def source_kl(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source KL divergence from the corpus unigram distribution,
    in micro-nats: KL(p_s ‖ p) = Σ_t p_s(t)·ln(p_s(t)/p(t)), computed
    as Σ_t c_st·FLOOR(1e6·ln((c_st·N)/(n_s·c_t))) DIV n_s. The
    mixture-drift dashboard: a source whose vocabulary diverges from
    the corpus is mis-weighted, mis-scraped, or another language.

    One ln per (source, token) pair — bounded by sources × vocabulary,
    never the occurrence stream."""
    toks = docs.select(
        "source",
        F.explode(F.split(norm_text(text_col), " ")).alias("token"),
    ).where(F.length("token") > 0)
    stc = toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c_st"))
    sc = stc.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    gc = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c_t"))
    n_total = gc.agg(F.sum("c_t").alias("n"))
    terms = (
        stc.join(sc, "source")
        .join(gc, "token")
        .crossJoin(F.broadcast(n_total))
        .select(
            "source",
            "n_s",
            (
                F.col("c_st")
                * F.floor(
                    F.lit(1_000_000)
                    * F.log(
                        (F.col("c_st").cast("double") * F.col("n"))
                        / (F.col("n_s").cast("double") * F.col("c_t"))
                    )
                ).cast("long")
            ).alias("term"),
        )
    )
    return (
        terms.groupBy("source", "n_s")
        .agg(F.sum("term").alias("total"))
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            F.expr("total DIV n_s").alias("kl_micro"),
        )
    )


def source_kl_sql(doc_table: str = "documents") -> str:
    """DuckDB twin of :func:`source_kl`."""
    return (
        f"WITH norm AS (SELECT source, {NORM_SQL} AS nt FROM {doc_table}), "
        "toks AS (SELECT source, unnest(string_split(nt, ' ')) AS token FROM norm), "
        "tf AS (SELECT source, token FROM toks WHERE length(token) > 0), "
        "stc AS (SELECT source, token, COUNT(*) AS c_st FROM tf GROUP BY 1, 2), "
        "sc AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s FROM stc GROUP BY source), "
        "gc AS (SELECT token, COUNT(*) AS c_t FROM tf GROUP BY token), "
        "nt AS (SELECT CAST(SUM(c_t) AS BIGINT) AS n FROM gc), "
        "terms AS (SELECT stc.source, sc.n_s, c_st * CAST(FLOOR(1000000 * "
        "LN((CAST(c_st AS DOUBLE) * n) / (CAST(n_s AS DOUBLE) * c_t))) AS BIGINT) AS term "
        "FROM stc JOIN sc ON stc.source = sc.source "
        "JOIN gc ON stc.token = gc.token, nt) "
        "SELECT source, n_s AS n_tokens, "
        "CAST(SUM(term) // n_s AS BIGINT) AS kl_micro "
        "FROM terms GROUP BY source, n_s"
    )


# ---------------------------------------------------------------------------
# term-dictionary front coding — the vocab-storage sizing twin of
# posting_gaps' posting-list sizing
# ---------------------------------------------------------------------------
def dict_frontcoding(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Front-coding size estimate of the sorted term dictionary: within
    each first-character block, consecutive terms store one
    shared-prefix-length byte plus their unshared suffix (the block
    head stores itself whole). Returns per-block
    (block, n_terms, raw_bytes, coded_bytes).

    The lag window is PARTITIONED by block — per-block state only, the
    same parallel-window discipline as posting_gaps. The lcp is
    computed as the count of matching prefixes over
    ``sequence(1, least(len, len_prev))`` (prefix matching is monotone,
    so the count IS the lcp) — JVM higher-order functions, no Python."""
    vocab = (
        docs.select(F.explode(F.split(norm_text(text_col), " ")).alias("token"))
        .where(F.length("token") > 0)
        .distinct()
        .withColumn("block", F.substring("token", 1, 1))
    )
    w = Window.partitionBy("block").orderBy("token")
    lagged = vocab.withColumn("prev", F.lag("token").over(w))
    sized = lagged.select(
        "block",
        F.length("token").alias("raw"),
        F.when(F.col("prev").isNull(), F.length("token"))
        .otherwise(
            F.lit(1)
            + F.length("token")
            - F.size(
                F.expr(
                    "filter(sequence(1, least(length(token), length(prev))), "
                    "i -> substring(token, 1, i) = substring(prev, 1, i))"
                )
            )
        )
        .alias("coded"),
    )
    return (
        sized.groupBy("block")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("raw").alias("raw_bytes"),
            F.sum("coded").alias("coded_bytes"),
        )
    )


def dict_frontcoding_sql(doc_table: str = "documents") -> str:
    """DuckDB twin of :func:`dict_frontcoding`."""
    return (
        f"WITH norm AS (SELECT {NORM_SQL} AS nt FROM {doc_table}), "
        "toks AS (SELECT unnest(string_split(nt, ' ')) AS token FROM norm), "
        "vocab AS (SELECT DISTINCT token FROM toks WHERE length(token) > 0), "
        "blocked AS (SELECT token, substr(token, 1, 1) AS block FROM vocab), "
        "lagged AS (SELECT block, token, "
        "LAG(token) OVER (PARTITION BY block ORDER BY token) AS prev FROM blocked), "
        "sized AS (SELECT block, length(token) AS raw, "
        "CASE WHEN prev IS NULL THEN length(token) ELSE 1 + length(token) - "
        "len(list_filter(generate_series(1, least(length(token), length(prev))), "
        "i -> substr(token, 1, i) = substr(prev, 1, i))) END AS coded FROM lagged) "
        "SELECT block, CAST(COUNT(*) AS BIGINT) AS n_terms, "
        "CAST(SUM(raw) AS BIGINT) AS raw_bytes, "
        "CAST(SUM(coded) AS BIGINT) AS coded_bytes FROM sized GROUP BY block"
    )


def llr_bigrams(
    docs: DataFrame,
    min_pair: int = 5,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` ADJACENT-bigram collocations by Dunning's
    log-likelihood ratio (G², Dunning 1993) — the collocation statistic
    that, unlike PMI (:func:`pmi_pairs`, document-level co-occurrence),
    is well-calibrated for low counts and so is the standard phrase /
    multi-word-expression extractor over a fresh crawl.

    G² = 2 Σ O·ln(O/E) over the 2×2 contingency table of "bigram
    starts with t1" × "bigram ends with t2": O11=c12, O12=c1−c12,
    O21=c2−c12, O22=N−c1−c2+c12 with E from the marginals. Zero cells
    contribute 0 (lim x→0 x·ln x = 0).

    Determinism contract (same as pmi_pairs): every O·N and
    marginal product is an exact BIGINT (< 2⁵³ at oracle scale), the
    single IEEE divide feeds ln on a bit-identical double in both
    engines, the 4 terms sum in a fixed order, and ordering is by the
    ROUNDED llr with (t1,t2) tie-breaks. One shuffle for the bigram
    count, two broadcast-sized marginal joins; the bigram stream never
    self-joins, so there is no blowup to cap.

    Result: (t1, t2, n12, llr) — llr rounded to 4.
    """
    toks = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(norm_text(text_col), " ")).alias(
                "pos", "token"
            ),
        )
        .where(F.length("token") > 0)
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        toks.withColumn("t2", F.lead("token").over(w))
        .where(F.col("t2").isNotNull())
        .select(F.col("token").alias("t1"), "t2")
    )
    n_big = big.agg(F.count(F.lit(1)).alias("n")).withColumnRenamed("n", "N")
    c12 = big.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = big.groupBy("t1").agg(F.count(F.lit(1)).alias("c1"))
    c2 = big.groupBy("t2").agg(F.count(F.lit(1)).alias("c2"))
    j = (
        c12.where(F.col("n12") >= min_pair)
        .join(c1, "t1")
        .join(c2, "t2")
        .join(F.broadcast(n_big))
    )

    def term(o, r, c):
        return F.when(
            o <= 0, F.lit(0.0)
        ).otherwise(o.cast("double") * F.log((o * F.col("N")) / (r * c)))

    o11 = F.col("n12")
    o12 = F.col("c1") - F.col("n12")
    o21 = F.col("c2") - F.col("n12")
    o22 = F.col("N") - F.col("c1") - F.col("c2") + F.col("n12")
    r1, r2 = F.col("c1"), F.col("N") - F.col("c1")
    k1, k2 = F.col("c2"), F.col("N") - F.col("c2")
    llr = F.round(
        2.0
        * (
            term(o11, r1, k1)
            + term(o12, r1, k2)
            + term(o21, r2, k1)
            + term(o22, r2, k2)
        ),
        4,
    )
    return (
        j.select("t1", "t2", F.col("n12").cast("long").alias("n12"), llr.alias("llr"))
        .orderBy(F.desc("llr"), "t1", "t2")
        .limit(k)
    )


def llr_bigrams_sql(
    min_pair: int = 5, k: int = 50, doc_table: str = "documents"
) -> str:
    """DuckDB twin of :func:`llr_bigrams`."""
    t = (
        "CASE WHEN {o} <= 0 THEN 0.0 ELSE CAST({o} AS DOUBLE) * "
        "ln(CAST(({o}) * N AS DOUBLE) / CAST(({r}) * ({c}) AS DOUBLE)) END"
    )
    terms = " + ".join(
        [
            t.format(o="n12", r="c1", c="c2"),
            t.format(o="(c1 - n12)", r="c1", c="(N - c2)"),
            t.format(o="(c2 - n12)", r="(N - c1)", c="c2"),
            t.format(o="(N - c1 - c2 + n12)", r="(N - c1)", c="(N - c2)"),
        ]
    )
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table}), "
        "toks AS (SELECT doc_id, token, ord FROM (SELECT doc_id, "
        "UNNEST(string_split(nt, ' ')) AS token, "
        "generate_subscripts(string_split(nt, ' '), 1) AS ord FROM norm) "
        "WHERE length(token) > 0), "
        "big AS (SELECT token AS t1, LEAD(token) OVER "
        "(PARTITION BY doc_id ORDER BY ord) AS t2 FROM toks), "
        "bg AS (SELECT t1, t2 FROM big WHERE t2 IS NOT NULL), "
        "nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS N FROM bg), "
        "p12 AS (SELECT t1, t2, CAST(COUNT(*) AS BIGINT) AS n12 "
        "FROM bg GROUP BY t1, t2), "
        "m1 AS (SELECT t1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bg GROUP BY t1), "
        "m2 AS (SELECT t2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY t2) "
        "SELECT t1, t2, n12, llr FROM (SELECT p12.t1, p12.t2, p12.n12, "
        f"ROUND(2.0 * ({terms}), 4) AS llr "
        "FROM p12 JOIN m1 ON m1.t1 = p12.t1 JOIN m2 ON m2.t2 = p12.t2, nb "
        f"WHERE p12.n12 >= {min_pair}) "
        f"ORDER BY llr DESC, t1, t2 LIMIT {k}"
    )


def tfidf_cosine_topk(
    docs: DataFrame,
    min_df: int = 2,
    max_df_den: int = 5,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` most-similar document pairs by TF-IDF cosine — the
    sparse-vector similarity join (tf·ln(N/df) weights) that
    complements the set-based dedup tiers (Jaccard/MinHash treat
    repeated terms as one; TF-IDF cosine is what a retrieval/cluster
    pipeline actually ranks with).

    Sparse join shape: weights live as (doc, token, w) rows; the dot
    product is one self-join ON TOKEN (never doc×doc) followed by a
    partial-agg sum, so cost is Σ_t df(t)² — bounded by the df band
    [min_df, N/max_df_den], the same blowup contract as pmi_pairs.
    Norms use the SAME banded weights, so the cosine is exactly
    self-consistent with the banded dot products.

    Determinism: tf and df are exact ints, idf = ln(N/df) on one IEEE
    divide (pmi discipline), cosine rounded to 6 with (a, b)
    tie-breaks. Result: (a, b, cosine), a < b."""
    return (
        _tfidf_cosine_scored(docs, min_df, max_df_den, text_col)
        .orderBy(F.desc("cosine"), "a", "b")
        .limit(k)
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    threshold: float,
    min_df: int = 2,
    max_df_den: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """All document pairs with TF-IDF cosine ≥ ``threshold`` (same
    scorer as :func:`tfidf_cosine_topk`) — the edge list of the
    document-similarity graph (LexRank's input)."""
    return _tfidf_cosine_scored(docs, min_df, max_df_den, text_col).where(
        F.col("cosine") >= threshold
    )


def _tfidf_cosine_scored(
    docs: DataFrame, min_df: int, max_df_den: int, text_col: str
) -> DataFrame:
    tf = (
        _tokens(docs, text_col)
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    wgt = (
        tf.join(df, "token")
        .join(F.broadcast(n_docs))
        .where(
            (F.col("df") >= min_df)
            & (F.col("df") * max_df_den <= F.col("n_docs"))
        )
        .select(
            "doc_id",
            "token",
            (
                F.col("tf").cast("double")
                * F.log(F.col("n_docs").cast("double") / F.col("df"))
            ).alias("w"),
        )
    )
    norms = wgt.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    wa = wgt.select(F.col("doc_id").alias("a"), "token", F.col("w").alias("wa"))
    wb = wgt.select(F.col("doc_id").alias("b"), "token", F.col("w").alias("wb"))
    dots = (
        wa.join(wb, "token")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("b"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias(
                "cosine"
            ),
        )
    )


def tfidf_cosine_topk_sql(
    min_df: int = 2,
    max_df_den: int = 5,
    k: int = 50,
    doc_table: str = "documents",
) -> str:
    """DuckDB twin of :func:`tfidf_cosine_topk`."""
    return (
        f"WITH {tfidf_cosine_cte(min_df, max_df_den, doc_table)} "
        "SELECT a, b, cosine FROM simpairs "
        f"ORDER BY cosine DESC, a, b LIMIT {k}"
    )


def tfidf_cosine_cte(
    min_df: int = 2,
    max_df_den: int = 5,
    doc_table: str = "documents",
) -> str:
    """CTE chain ending in ``simpairs(a, b, cosine)`` — the shared
    scorer for the top-k twin above and the LexRank edge oracle."""
    return (
        f"norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table}), "
        "tok AS (SELECT doc_id, token FROM (SELECT doc_id, "
        "UNNEST(string_split(nt, ' ')) AS token FROM norm) "
        "WHERE length(token) > 0), "
        "tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf "
        "FROM tok GROUP BY doc_id, token), "
        f"nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM {doc_table}), "
        "dfs AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df "
        "FROM tf GROUP BY token), "
        "wgt AS (SELECT tf.doc_id, tf.token, CAST(tf.tf AS DOUBLE) * "
        "ln(CAST(nd.n_docs AS DOUBLE) / dfs.df) AS w "
        "FROM tf JOIN dfs ON dfs.token = tf.token, nd "
        f"WHERE dfs.df >= {min_df} AND dfs.df * {max_df_den} <= nd.n_docs), "
        "norms AS (SELECT doc_id, sqrt(SUM(w * w)) AS nrm "
        "FROM wgt GROUP BY doc_id), "
        "dots AS (SELECT a.doc_id AS a, b.doc_id AS b, "
        "SUM(a.w * b.w) AS dot FROM wgt a JOIN wgt b "
        "ON a.token = b.token AND a.doc_id < b.doc_id "
        "GROUP BY a.doc_id, b.doc_id), "
        "simpairs AS (SELECT d.a, d.b, "
        "ROUND(d.dot / (na.nrm * nb.nrm), 6) AS cosine "
        "FROM dots d JOIN norms na ON na.doc_id = d.a "
        "JOIN norms nb ON nb.doc_id = d.b)"
    )


def champion_lists(
    docs: DataFrame,
    n_terms: int = 20,
    per_term: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Champion lists / impact-ordered posting heads (IR's classic
    top-docs-per-term acceleration, Manning CS276): for the
    ``n_terms`` highest-volume vocabulary terms, the ``per_term`` docs
    with the highest term frequency. A query processor that scans only
    champion heads answers top-k queries without touching full posting
    lists — the at-scale companion to ``posting_gaps`` (which sizes
    the full lists this structure lets you skip).

    Exact ints throughout; term selection ties break by token, doc
    ranks by (tf desc, doc_id). Both windows partition by token — the
    hot-key state is per_term rows.

    Result: (token, doc_id, tf, rank)."""
    tf = (
        _tokens(docs, text_col)
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    totals = tf.groupBy("token").agg(F.sum("tf").alias("total"))
    top_terms = totals.orderBy(F.desc("total"), "token").limit(n_terms)
    w = Window.partitionBy("token").orderBy(F.desc("tf"), "doc_id")
    return (
        tf.join(F.broadcast(top_terms.select("token")), "token")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= per_term)
        .select(
            "token",
            "doc_id",
            F.col("tf").cast("long").alias("tf"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def champion_lists_sql(
    n_terms: int = 20, per_term: int = 5, doc_table: str = "documents"
) -> str:
    """DuckDB twin of :func:`champion_lists`."""
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table}), "
        "tok AS (SELECT doc_id, token FROM (SELECT doc_id, "
        "UNNEST(string_split(nt, ' ')) AS token FROM norm) "
        "WHERE length(token) > 0), "
        "tf AS (SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf "
        "FROM tok GROUP BY token, doc_id), "
        "tot AS (SELECT token FROM (SELECT token, SUM(tf) AS total "
        "FROM tf GROUP BY token) "
        f"ORDER BY total DESC, token LIMIT {n_terms}), "
        "ranked AS (SELECT tf.token, tf.doc_id, tf.tf, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY tf.token "
        "ORDER BY tf.tf DESC, tf.doc_id) AS BIGINT) AS rank "
        "FROM tf JOIN tot ON tot.token = tf.token) "
        f"SELECT token, doc_id, tf, rank FROM ranked WHERE rank <= {per_term}"
    )


RAKE_STOPWORDS: tuple[str, ...] = (
    # the en marker list from textstats._LANG_MARKERS plus the bare
    # function words RAKE's original English list leads with — a small
    # public-knowledge set; the point is the phrase plumbing
    "the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
    "a", "an", "on", "as", "at", "by", "with", "from", "this", "are",
    "be", "or", "not",
)


def rake_phrases(
    docs: DataFrame,
    k: int = 50,
    max_len: int = 4,
    min_occ: int = 2,
    text_col: str = "text",
    stopwords: tuple[str, ...] = RAKE_STOPWORDS,
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free token runs; each content word w gets
    score deg(w)/freq(w) — freq counts w's occurrences in candidates,
    deg additionally credits co-occurring phrase length — and a phrase
    scores the sum over its words. The corpus-level keyphrase pass
    that complements TextRank (graph walk) and PMI/G² (pair
    statistics) with the phrase-segmentation view.

    Determinism: phrases reassemble via position-ordered aggregation
    (sort_array(struct(pos,token)) / string_agg ORDER BY), never an
    unordered collect_list; scores are exact integers — per-word
    ⌊10⁶·deg(w)/freq(w)⌋ floors summed (the harmonic_ppm convention),
    ranking by (score desc, phrase). Scale shape: one pass assigns
    stopword-run segment ids with a doc-partitioned window, phrase
    stats are two partial-agg groupBys; nothing quadratic, no Python.

    Result: top-``k`` rows (phrase, n_occ, score_ppm), phrases of
    ≤ ``max_len`` words occurring ≥ ``min_occ`` times."""
    toks = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(norm_text(text_col), " ")).alias(
                "pos", "token"
            ),
        )
        .where(F.length("token") > 0)
        .withColumn("stop", F.col("token").isin(*stopwords))
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    seg = toks.withColumn(
        "seg",
        F.sum(F.col("stop").cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).where(~F.col("stop"))
    phrases = (
        seg.groupBy("doc_id", "seg")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "token"))),
                    lambda s: s.getField("token"),
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).alias("plen"),
        )
        .where(F.col("plen") <= max_len)
    )
    words = phrases.select(
        "phrase", "plen", F.explode(F.split("phrase", " ")).alias("token")
    )
    stats = words.groupBy("token").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("deg"),
    )
    per_phrase = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).alias("n_occ")
    )
    pscore = (
        words.select("phrase", "token")
        .distinct()
        .join(stats, "token")
        .groupBy("phrase")
        .agg(
            F.sum(F.expr("(1000000 * deg) div freq"))
            .cast("long")
            .alias("score_ppm")
        )
    )
    return (
        per_phrase.where(F.col("n_occ") >= min_occ)
        .join(pscore, "phrase")
        .select("phrase", F.col("n_occ").cast("long").alias("n_occ"), "score_ppm")
        .orderBy(F.desc("score_ppm"), "phrase")
        .limit(k)
    )


def rake_phrases_sql(
    k: int = 50,
    max_len: int = 4,
    min_occ: int = 2,
    doc_table: str = "documents",
    stopwords: tuple[str, ...] = RAKE_STOPWORDS,
) -> str:
    """DuckDB twin of :func:`rake_phrases`."""
    stoplist = ", ".join(f"'{s}'" for s in stopwords)
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table}), "
        "toks AS (SELECT doc_id, token, ord, "
        f"token IN ({stoplist}) AS stop FROM (SELECT doc_id, "
        "UNNEST(string_split(nt, ' ')) AS token, "
        "generate_subscripts(string_split(nt, ' '), 1) AS ord FROM norm) "
        "WHERE length(token) > 0), "
        "seg AS (SELECT doc_id, token, ord, stop, "
        "SUM(CASE WHEN stop THEN 1 ELSE 0 END) OVER "
        "(PARTITION BY doc_id ORDER BY ord ROWS UNBOUNDED PRECEDING) AS seg "
        "FROM toks), "
        "phrases AS (SELECT doc_id, seg, "
        "string_agg(token, ' ' ORDER BY ord) AS phrase, "
        "CAST(COUNT(*) AS BIGINT) AS plen "
        "FROM seg WHERE NOT stop GROUP BY doc_id, seg "
        f"HAVING COUNT(*) <= {max_len}), "
        "words AS (SELECT phrase, plen, "
        "UNNEST(string_split(phrase, ' ')) AS token FROM phrases), "
        "stats AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS freq, "
        "CAST(SUM(plen) AS BIGINT) AS deg FROM words GROUP BY token), "
        "per_phrase AS (SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occ "
        "FROM phrases GROUP BY phrase), "
        "pscore AS (SELECT w.phrase, CAST(SUM((1000000 * s.deg) // s.freq) "
        "AS BIGINT) AS score_ppm FROM "
        "(SELECT DISTINCT phrase, token FROM words) w "
        "JOIN stats s ON s.token = w.token GROUP BY w.phrase) "
        "SELECT p.phrase, p.n_occ, sc.score_ppm "
        "FROM per_phrase p JOIN pscore sc ON sc.phrase = p.phrase "
        f"WHERE p.n_occ >= {min_occ} "
        f"ORDER BY sc.score_ppm DESC, p.phrase LIMIT {k}"
    )


def bigram_surprisal(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document mean BIGRAM surprisal in micro-nats under the
    corpus conditional bigram model with add-1 smoothing:
    s(t1→t2) = FLOOR(1e6·ln((c1 + V)/(c12 + 1))) where c12 is the
    corpus count of the bigram, c1 the count of bigrams starting with
    t1 and V the first-token vocabulary size. The sequence-aware
    upgrade of :func:`unigram_surprisal`: a doc built from common
    words in IMPROBABLE order (shuffled spam, keyword stuffing) reads
    low-unigram but high-bigram surprisal — the gap between the two is
    the word-salad detector.

    Same contract as the unigram op: the only ln runs on the distinct
    bigram-type table, everything after the floor is exact integers,
    per-doc totals are one weighted join + integer DIV.

    Result: (doc_id, n_bigrams, mean_surprisal_micro) — docs with ≥1
    bigram."""
    toks = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(norm_text(text_col), " ")).alias(
                "pos", "token"
            ),
        )
        .where(F.length("token") > 0)
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        toks.withColumn("t2", F.lead("token").over(w))
        .where(F.col("t2").isNotNull())
        .select("doc_id", F.col("token").alias("t1"), "t2")
    )
    dbc = big.groupBy("doc_id", "t1", "t2").agg(
        F.count(F.lit(1)).alias("c_d")
    )
    c12 = big.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = big.groupBy("t1").agg(F.count(F.lit(1)).alias("c1"))
    v = c1.agg(F.count(F.lit(1)).alias("v"))
    s = (
        c12.join(c1, "t1")
        .join(F.broadcast(v))
        .select(
            "t1",
            "t2",
            F.floor(
                F.lit(1_000_000)
                * F.log(
                    (F.col("c1") + F.col("v")).cast("double")
                    / (F.col("c12") + 1)
                )
            )
            .cast("long")
            .alias("s_micro"),
        )
    )
    return (
        dbc.join(s, ["t1", "t2"])
        .groupBy("doc_id")
        .agg(
            F.sum("c_d").alias("n_bigrams"),
            F.sum(F.col("c_d") * F.col("s_micro")).alias("total"),
        )
        .select(
            "doc_id",
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.expr("total DIV n_bigrams").cast("long").alias(
                "mean_surprisal_micro"
            ),
        )
    )


def bigram_surprisal_sql(doc_table: str = "documents") -> str:
    """DuckDB twin of :func:`bigram_surprisal`."""
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table}), "
        "toks AS (SELECT doc_id, token, ord FROM (SELECT doc_id, "
        "UNNEST(string_split(nt, ' ')) AS token, "
        "generate_subscripts(string_split(nt, ' '), 1) AS ord FROM norm) "
        "WHERE length(token) > 0), "
        "big AS (SELECT doc_id, t1, t2 FROM (SELECT doc_id, token AS t1, "
        "LEAD(token) OVER (PARTITION BY doc_id ORDER BY ord) AS t2 "
        "FROM toks) WHERE t2 IS NOT NULL), "
        "dbc AS (SELECT doc_id, t1, t2, CAST(COUNT(*) AS BIGINT) AS c_d "
        "FROM big GROUP BY doc_id, t1, t2), "
        "b12 AS (SELECT t1, t2, CAST(COUNT(*) AS BIGINT) AS c12 "
        "FROM big GROUP BY t1, t2), "
        "b1 AS (SELECT t1, CAST(COUNT(*) AS BIGINT) AS c1 FROM big GROUP BY t1), "
        "vv AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM b1), "
        "s AS (SELECT b12.t1, b12.t2, CAST(FLOOR(1000000 * "
        "LN(CAST(b1.c1 + vv.v AS DOUBLE) / (b12.c12 + 1))) AS BIGINT) "
        "AS s_micro FROM b12 JOIN b1 ON b1.t1 = b12.t1, vv) "
        "SELECT dbc.doc_id, CAST(SUM(c_d) AS BIGINT) AS n_bigrams, "
        "CAST(SUM(c_d * s_micro) // SUM(c_d) AS BIGINT) "
        "AS mean_surprisal_micro "
        "FROM dbc JOIN s ON s.t1 = dbc.t1 AND s.t2 = dbc.t2 "
        "GROUP BY dbc.doc_id"
    )


def next_token_top3(
    docs: DataFrame,
    min_ctx: int = 10,
    per_ctx: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Bigram continuation table — for every context token with ≥
    ``min_ctx`` bigram occurrences, its top-``per_ctx`` continuations
    with counts and conditional probability in ppm. The inspection
    table for the corpus' Markov structure (what an autocomplete or a
    contamination-probe would read), the word-level twin of
    event_transitions.

    One bigram pass (doc-partitioned lead window), one groupBy, one
    token-partitioned top-k window — hot-context state is per_ctx
    rows. Exact integers; ranking ties break by continuation token.

    Result: (t1, rank, t2, n12, p_ppm)."""
    toks = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(norm_text(text_col), " ")).alias(
                "pos", "token"
            ),
        )
        .where(F.length("token") > 0)
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        toks.withColumn("t2", F.lead("token").over(w))
        .where(F.col("t2").isNotNull())
        .select(F.col("token").alias("t1"), "t2")
    )
    c12 = big.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = big.groupBy("t1").agg(F.count(F.lit(1)).alias("c1"))
    wr = Window.partitionBy("t1").orderBy(F.desc("n12"), "t2")
    return (
        c12.join(c1.where(F.col("c1") >= min_ctx), "t1")
        .withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= per_ctx)
        .select(
            "t1",
            F.col("rank").cast("long").alias("rank"),
            "t2",
            F.col("n12").cast("long").alias("n12"),
            F.expr("(1000000 * n12) div c1").cast("long").alias("p_ppm"),
        )
    )


def next_token_top3_sql(
    min_ctx: int = 10, per_ctx: int = 3, doc_table: str = "documents"
) -> str:
    """DuckDB twin of :func:`next_token_top3`."""
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table}), "
        "toks AS (SELECT doc_id, token, ord FROM (SELECT doc_id, "
        "UNNEST(string_split(nt, ' ')) AS token, "
        "generate_subscripts(string_split(nt, ' '), 1) AS ord FROM norm) "
        "WHERE length(token) > 0), "
        "big AS (SELECT t1, t2 FROM (SELECT token AS t1, LEAD(token) OVER "
        "(PARTITION BY doc_id ORDER BY ord) AS t2 FROM toks) "
        "WHERE t2 IS NOT NULL), "
        "c12 AS (SELECT t1, t2, CAST(COUNT(*) AS BIGINT) AS n12 "
        "FROM big GROUP BY t1, t2), "
        "c1 AS (SELECT t1, CAST(COUNT(*) AS BIGINT) AS c1 "
        f"FROM big GROUP BY t1 HAVING COUNT(*) >= {min_ctx}), "
        "ranked AS (SELECT c12.t1, c12.t2, c12.n12, c1.c1, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY c12.t1 "
        "ORDER BY c12.n12 DESC, c12.t2) AS BIGINT) AS rank "
        "FROM c12 JOIN c1 ON c1.t1 = c12.t1) "
        "SELECT t1, rank, t2, n12, "
        "CAST((1000000 * n12) // c1 AS BIGINT) AS p_ppm "
        f"FROM ranked WHERE rank <= {per_ctx}"
    )


def log_odds_keyness(
    docs: DataFrame,
    group_value: str = "en",
    group_col: str = "lang",
    k: int = 25,
    alpha: float = 0.5,
    min_count: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-comparison keyness via log-odds with a Dirichlet prior
    (Monroe, Colaresi & Quinn 2008, "Fightin' Words") — the measure
    that fixes both raw-frequency bias (PMI's rare-word explosion) and
    χ²'s high-frequency bias when asking "which words typify corpus A
    vs corpus B". Group A = rows with ``group_col = group_value``,
    B = the rest; per term with y₁+y₂ ≥ min_count,

        δ_t = ln((y₁+α)/(n₁+αV−y₁−α)) − ln((y₂+α)/(n₂+αV−y₂−α))
        z_t = δ_t / √(1/(y₁+α) + 1/(y₂+α))

    All inputs to the scalar math are exact integer aggregates (token
    counts, totals, vocab size), so the doubles are order-independent
    and the twin hash-matches; z rounds to 6. One tokenize pass, two
    hash aggregates, a broadcastable scalar row — no Python. Result:
    top-k (token, y_a, y_b, z) by z desc, tiebreak token."""
    toks = docs.select(
        (F.col(group_col) == group_value).cast("int").alias("ga"),
        F.explode(F.split(norm_text(text_col), " ")).alias("token"),
    ).where(F.length("token") > 0)
    counts = toks.groupBy("token").agg(
        F.sum("ga").cast("long").alias("y1"),
        F.sum(F.lit(1) - F.col("ga")).cast("long").alias("y2"),
    )
    totals = counts.agg(
        F.sum("y1").alias("n1"),
        F.sum("y2").alias("n2"),
        F.count(F.lit(1)).alias("vv"),
    )
    a = F.lit(alpha)
    delta = F.log(
        (F.col("y1") + a) / (F.col("n1") + a * F.col("vv") - F.col("y1") - a)
    ) - F.log(
        (F.col("y2") + a) / (F.col("n2") + a * F.col("vv") - F.col("y2") - a)
    )
    var = 1.0 / (F.col("y1") + a) + 1.0 / (F.col("y2") + a)
    return (
        counts.where(F.col("y1") + F.col("y2") >= min_count)
        .crossJoin(F.broadcast(totals))
        .select(
            "token",
            F.col("y1").alias("y_a"),
            F.col("y2").alias("y_b"),
            F.round(delta / F.sqrt(var), 6).alias("z"),
        )
        .orderBy(F.desc("z"), F.asc("token"))
        .limit(k)
    )


def log_odds_keyness_sql(
    group_value: str = "en",
    group_col: str = "lang",
    k: int = 25,
    alpha: float = 0.5,
    min_count: int = 10,
    doc_table: str = "documents",
) -> str:
    """DuckDB twin of :func:`log_odds_keyness`."""
    gv = group_value.replace("'", "''")
    return (
        f"WITH norm AS (SELECT CASE WHEN {group_col} = '{gv}' THEN 1 ELSE 0 END"
        f" AS ga, {NORM_SQL} AS nt FROM {doc_table}), "
        "toks AS (SELECT ga, unnest(string_split(nt, ' ')) AS token FROM norm), "
        "tfl AS (SELECT ga, token FROM toks WHERE length(token) > 0), "
        "counts AS (SELECT token, CAST(SUM(ga) AS BIGINT) AS y1, "
        "CAST(SUM(1 - ga) AS BIGINT) AS y2 FROM tfl GROUP BY token), "
        "totals AS (SELECT SUM(y1) AS n1, SUM(y2) AS n2, "
        "COUNT(*) AS vv FROM counts) "
        "SELECT token, y1 AS y_a, y2 AS y_b, "
        f"ROUND((LN((y1 + {alpha}) / (n1 + {alpha} * vv - y1 - {alpha})) - "
        f"LN((y2 + {alpha}) / (n2 + {alpha} * vv - y2 - {alpha}))) / "
        f"SQRT(1.0 / (y1 + {alpha}) + 1.0 / (y2 + {alpha})), 6) AS z "
        f"FROM counts CROSS JOIN totals WHERE y1 + y2 >= {min_count} "
        f"ORDER BY z DESC, token ASC LIMIT {k}"
    )


def spell_variants(
    docs: DataFrame,
    k_terms: int = 50,
    min_len: int = 5,
    ratio_den: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Likely misspellings / OCR slips of the corpus's head terms: for
    each of the top ``k_terms`` tokens (length ≥ min_len, frequency
    desc, tiebreak token), every vocab token at Levenshtein distance
    EXACTLY 1 whose count is ≤ head_count / ratio_den — the classic
    frequency-asymmetry + unit-edit heuristic (Norvig's speller; the
    cleanup pass web-corpus curation runs before vocabulary cuts).

    Scale shape: the head table is ≤ k_terms rows and BROADCAST; the
    vocab side is pre-pruned by the length band |len−len(term)| ≤ 1
    (necessary for distance 1) before the Levenshtein evaluates, so
    the join is a broadcast nested loop over a band-filtered vocab —
    never vocab × vocab. Levenshtein is unit-cost in both engines.
    Result: (term, variant, term_count, variant_count)."""
    freq = (
        docs.select(
            F.explode(F.split(norm_text(text_col), " ")).alias("token")
        )
        .where(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    head = (
        freq.where(F.length("token") >= min_len)
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(k_terms)
        .select(F.col("token").alias("term"), F.col("cnt").alias("term_count"))
    )
    cand = freq.select(
        F.col("token").alias("variant"), F.col("cnt").alias("variant_count")
    )
    return (
        cand.join(
            F.broadcast(head),
            (
                F.abs(F.length("variant") - F.length("term")) <= 1
            )
            & (F.col("variant") != F.col("term"))
            & (F.col("variant_count") * ratio_den <= F.col("term_count"))
            & (F.levenshtein("term", "variant") == 1),
        )
        .select("term", "variant", "term_count", "variant_count")
    )


def spell_variants_sql(
    k_terms: int = 50,
    min_len: int = 5,
    ratio_den: int = 10,
    doc_table: str = "documents",
    pre_cte: str = "",
) -> str:
    """DuckDB twin of :func:`spell_variants`. ``pre_cte``: optional
    leading CTE(s) (e.g. a deterministic corruption-injection CTE the
    redact_pii oracle pattern uses) spliced in before ``norm``; pass
    ``doc_table`` naming the CTE's output relation."""
    pre = f"{pre_cte}, " if pre_cte else ""
    return (
        f"WITH {pre}norm AS (SELECT {NORM_SQL} AS nt FROM {doc_table}), "
        "toks AS (SELECT unnest(string_split(nt, ' ')) AS token FROM norm), "
        "freq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt "
        "FROM toks WHERE length(token) > 0 GROUP BY token), "
        "head AS (SELECT token AS term, cnt AS term_count FROM freq "
        f"WHERE length(token) >= {min_len} "
        f"ORDER BY cnt DESC, token ASC LIMIT {k_terms}) "
        "SELECT h.term, f.token AS variant, h.term_count, "
        "f.cnt AS variant_count "
        "FROM freq f JOIN head h ON "
        "ABS(length(f.token) - length(h.term)) <= 1 "
        "AND f.token <> h.term "
        f"AND f.cnt * {ratio_den} <= h.term_count "
        "AND levenshtein(h.term, f.token) = 1"
    )


def greedy_cover(
    docs: DataFrame,
    k: int = 5,
    pool: int = 12,
    text_col: str = "text",
) -> DataFrame:
    """Greedy maximum-coverage document selection — the (1−1/e)
    submodular-maximization workhorse behind coverage-driven data
    curation (pick the k docs that jointly cover the most vocabulary):
    repeatedly take the document adding the most NOT-yet-covered
    tokens, ties by doc_id. Candidates are the top-``pool`` docs by
    distinct-token count (count desc, doc_id asc) — the standard
    lazy-greedy pool bound.

    Scale shape: tokenize + per-doc distinct counts are distributed
    one-pass aggregates; only the pool's (doc, token) pairs — ≤ pool ×
    vocab rows, constant-bounded — are collected for the inherently
    sequential greedy loop (the mmr_topk / kmeans-centroid scalar-read
    convention). Pure integer gains, so the twin matches exactly.
    Result: (rank, doc_id, gain) in selection order."""
    dt = (
        docs.select(
            "doc_id",
            F.explode(F.split(norm_text(text_col), " ")).alias("token"),
        )
        .where(F.length("token") > 0)
        .distinct()
    )
    pool_df = (
        dt.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
        .orderBy(F.desc("n_tokens"), F.asc("doc_id"))
        .limit(pool)
    )
    pairs = dt.join(pool_df.select("doc_id"), "doc_id").collect()
    sets: dict[int, set[str]] = {}
    for r in pairs:
        sets.setdefault(r["doc_id"], set()).add(r["token"])
    covered: set[str] = set()
    out = []
    remaining = sorted(sets)
    for rank in range(1, k + 1):
        if not remaining:
            break
        best = sorted(
            remaining, key=lambda d: (-len(sets[d] - covered), d)
        )[0]
        gain = len(sets[best] - covered)
        out.append((rank, best, gain))
        covered |= sets[best]
        remaining.remove(best)
    return docs.sparkSession.createDataFrame(
        out, "rank long, doc_id long, gain long"
    )


def greedy_cover_sql(
    k: int = 5,
    pool: int = 12,
    doc_table: str = "documents",
) -> str:
    """DuckDB twin of :func:`greedy_cover` — the k greedy steps
    unrolled as MATERIALIZED argmax CTEs (the mmr_topk_sql pattern);
    covered-token state c_i accumulates by UNION."""
    parts = [
        f"WITH dt AS MATERIALIZED (SELECT DISTINCT doc_id, token FROM "
        f"(SELECT doc_id, unnest(string_split({NORM_SQL}, ' ')) AS token "
        f"FROM {doc_table}) WHERE length(token) > 0)",
        "pool AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n_tokens FROM dt "
        f"GROUP BY doc_id ORDER BY n_tokens DESC, doc_id ASC LIMIT {pool})",
        "pdt AS MATERIALIZED (SELECT dt.doc_id, dt.token FROM dt "
        "JOIN pool ON pool.doc_id = dt.doc_id)",
        "g1 AS MATERIALIZED (SELECT doc_id, COUNT(*) AS gain FROM pdt "
        "GROUP BY doc_id ORDER BY gain DESC, doc_id ASC LIMIT 1)",
        "c1 AS MATERIALIZED (SELECT DISTINCT p.token FROM pdt p "
        "JOIN g1 ON g1.doc_id = p.doc_id)",
        "sel1 AS MATERIALIZED (SELECT doc_id FROM g1)",
    ]
    for i in range(2, k + 1):
        parts.append(
            f"g{i} AS MATERIALIZED (SELECT p.doc_id, "
            f"COUNT(*) FILTER (WHERE c.token IS NULL) AS gain FROM pdt p "
            f"LEFT JOIN c{i-1} c ON c.token = p.token "
            f"WHERE p.doc_id NOT IN (SELECT doc_id FROM sel{i-1}) "
            f"GROUP BY p.doc_id ORDER BY gain DESC, p.doc_id ASC LIMIT 1)"
        )
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT token FROM c{i-1} UNION "
            f"SELECT p.token FROM pdt p JOIN g{i} ON g{i}.doc_id = p.doc_id)"
        )
        parts.append(
            f"sel{i} AS MATERIALIZED (SELECT doc_id FROM sel{i-1} "
            f"UNION ALL SELECT doc_id FROM g{i})"
        )
    final = " UNION ALL ".join(
        f"SELECT {i} AS rank, doc_id, CAST(gain AS BIGINT) AS gain FROM g{i}"
        for i in range(1, k + 1)
    )
    return ", ".join(parts) + " " + final


def burrows_delta(
    docs: DataFrame,
    k_terms: int = 20,
    k_pairs: int = 20,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Burrows' Delta (Burrows 2002, "Delta: a measure of stylistic
    difference") between sources — THE stylometric distance: restrict
    to the ``k_terms`` most frequent corpus words, z-score each term's
    per-source relative frequency across sources, and

        Δ(a, b) = mean_t |z_a(t) − z_b(t)|

    Web-curation use: near-zero Δ between nominally distinct sources
    flags mirrored/templated feeds the host-level dedup misses. Terms
    whose frequency profile is constant across sources (σ = 0) drop in
    both dialects. Grid = sources × k_terms (broadcast-sized), stats
    per term over ≤|sources| values, pair join over |sources|² rows —
    everything after the one tokenize pass is tiny; z/Δ round to 6.
    Result: top-``k_pairs`` closest (source_a, source_b, delta) by
    delta asc, tiebreak (a, b)."""
    toks = docs.select(
        F.col(group_col).alias("g"),
        F.explode(F.split(norm_text(text_col), " ")).alias("token"),
    ).where(F.length("token") > 0)
    mft = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(k_terms)
        .select("token")
    )
    tf = toks.groupBy("g", "token").agg(F.count(F.lit(1)).alias("tf"))
    totals = toks.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    grid = (
        totals.crossJoin(F.broadcast(mft))
        .join(tf, ["g", "token"], "left")
        .select(
            "g",
            "token",
            (F.coalesce("tf", F.lit(0)) / F.col("n")).alias("rf"),
        )
    )
    stats = grid.groupBy("token").agg(
        F.avg("rf").alias("mu"),
        F.sqrt(F.var_pop("rf")).alias("sigma"),
    )
    z = (
        grid.join(stats, "token")
        .where(F.col("sigma") > 0)
        .select(
            "g", "token", ((F.col("rf") - F.col("mu")) / F.col("sigma")).alias("z")
        )
    )
    a = z.select(F.col("g").alias("source_a"), "token", F.col("z").alias("za"))
    b = z.select(F.col("g").alias("source_b"), "token", F.col("z").alias("zb"))
    return (
        a.join(b, "token")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.round(F.avg(F.abs(F.col("za") - F.col("zb"))), 6).alias("delta"))
        .orderBy(F.asc("delta"), F.asc("source_a"), F.asc("source_b"))
        .limit(k_pairs)
    )


def burrows_delta_sql(
    k_terms: int = 20,
    k_pairs: int = 20,
    group_col: str = "source",
    doc_table: str = "documents",
) -> str:
    """DuckDB twin of :func:`burrows_delta`."""
    return (
        f"WITH norm AS (SELECT {group_col} AS g, {NORM_SQL} AS nt "
        f"FROM {doc_table}), "
        "toks AS (SELECT g, unnest(string_split(nt, ' ')) AS token FROM norm), "
        "tfl AS (SELECT g, token FROM toks WHERE length(token) > 0), "
        "mft AS (SELECT token FROM (SELECT token, COUNT(*) AS cnt FROM tfl "
        f"GROUP BY token ORDER BY cnt DESC, token ASC LIMIT {k_terms})), "
        "tf AS (SELECT g, token, COUNT(*) AS tf FROM tfl GROUP BY g, token), "
        "totals AS (SELECT g, COUNT(*) AS n FROM tfl GROUP BY g), "
        "grid AS (SELECT t.g, m.token, "
        "COALESCE(tf.tf, 0) / CAST(t.n AS DOUBLE) AS rf "
        "FROM totals t CROSS JOIN mft m "
        "LEFT JOIN tf ON tf.g = t.g AND tf.token = m.token), "
        "stats AS (SELECT token, AVG(rf) AS mu, SQRT(VAR_POP(rf)) AS sigma "
        "FROM grid GROUP BY token), "
        "z AS (SELECT g, grid.token, (rf - mu) / sigma AS z FROM grid "
        "JOIN stats ON stats.token = grid.token WHERE sigma > 0) "
        "SELECT a.g AS source_a, b.g AS source_b, "
        "ROUND(AVG(ABS(a.z - b.z)), 6) AS delta "
        "FROM z a JOIN z b ON a.token = b.token AND a.g < b.g "
        "GROUP BY a.g, b.g "
        f"ORDER BY delta ASC, source_a ASC, source_b ASC LIMIT {k_pairs}"
    )
