"""Cross-document repetition and benchmark-contamination analysis.

The two corpus-hygiene passes an LLM training pipeline runs after
per-document quality filtering (beyond the reference's scope — its
surface is graph kernels — but first-class here per the engine's
training-data mandate):

- :func:`repeated_ngrams` — the relational core of exact-substring
  deduplication (Lee et al. 2022, "Deduplicating Training Data Makes
  Language Models Better"): for every document, what fraction of its
  word n-grams also occurs elsewhere in the corpus. High-fraction
  documents are boilerplate/mirror candidates; the per-gram counts are
  the candidate spans a full suffix-automaton pass would cut.
- :func:`contamination` — n-gram overlap against a benchmark set
  (the GPT-3 appendix-C decontamination shape): for every training
  document, how many of its distinct n-grams appear in any benchmark
  document.

Scale shape
-----------
Both ops hash every n-gram to 60 bits (first 15 hex digits of md5 —
the engine-wide portable idiom, ops/sampling.py) *before* any shuffle:
the wide gram strings never leave the map side, group/join keys are
fixed-width int64, and the hash is reproducible in DuckDB for the
oracle. Collisions merge two grams' counts (P ≈ (G²/2)/2⁶⁰ — at 10¹²
grams ≈ 4·10⁵ merges, noise for corpus statistics; an exact-string
variant is one `.alias` swap). Gram construction stays inside the
array domain (textstats._ngram_array — no row explosion until the
single explode that feeds the partial-aggregated count). The
contamination join puts the benchmark side second so Spark broadcasts
it (real benchmark suites are ≪ 10 MB of distinct grams); the corpus
side is never collected or re-shuffled beyond the one distinct.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .textstats import NORM_SQL, _ngram_array, norm_text

# DuckDB twin in _gram_hash_sql below
def _gram_hash(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _gram_hash_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def _doc_grams(docs: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, g) — one row per n-gram *position* (multiplicity kept),
    g already hashed to int64."""
    nt = norm_text(text_col)
    toks = F.when(nt == "", F.array().cast("array<string>")).otherwise(
        F.split(nt, " ")
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.transform(_ngram_array(toks, n), _gram_hash)).alias("g"),
    )


def _grams_sql(doc_table: str, n: int) -> str:
    """CTE body producing (doc_id, g) with the same hash — n-grams via
    the indexed list_transform idiom (textstats.repetition_stats_sql)."""
    joined = " || ' ' || ".join(
        ["x"] + [f"l[i + {j}]" for j in range(1, n)]
    )
    # the < n guard matters: DuckDB's list_slice treats a negative end
    # as from-the-end indexing, so length(l) - (n-1) on a short doc
    # would wrap around instead of yielding the empty slice Spark's
    # _ngram_array produces
    return (
        f"SELECT doc_id, {_gram_hash_sql('gs')} AS g FROM ("
        f"SELECT doc_id, unnest(CASE WHEN length(l) < {n} "
        f"THEN CAST([] AS VARCHAR[]) ELSE list_transform("
        f"list_slice(l, 1, length(l) - {n - 1}), (x, i) -> {joined}) END) AS gs "
        f"FROM (SELECT doc_id, CASE WHEN nt = '' THEN CAST([] AS VARCHAR[]) "
        f"ELSE string_split(nt, ' ') END AS l FROM "
        f"(SELECT doc_id, {NORM_SQL} AS nt FROM {doc_table})))"
    )


def repeated_ngrams(
    docs: DataFrame,
    n: int = 5,
    min_occ: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document corpus-repetition stats over word ``n``-grams:

    - ``n_grams`` — this document's n-gram positions;
    - ``n_repeated`` — positions whose gram occurs ≥ ``min_occ`` times
      in the WHOLE corpus (within-doc repeats count toward the total,
      the Lee-et-al occurrence convention);
    - ``rep_bp`` — repeated fraction in exact basis points
      (``n_repeated·10⁴ div n_grams``, the quality_score convention).

    Every document gets a row (zero stats for blank/short text).

    Two shuffles total, both on int64 gram hashes: the corpus-wide
    count (map-side partial agg) and the per-doc × gram count joined
    against it; the per-doc totals then aggregate on doc_id."""
    grams = _doc_grams(docs, n, text_col, id_col)
    corpus = grams.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    per_doc = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("dc"))
    rep = (
        per_doc.join(corpus.where(F.col("c") >= min_occ), "g")
        .groupBy("doc_id")
        .agg(F.sum("dc").alias("n_repeated"))
    )
    totals = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(totals, "doc_id", "left")
        .join(rep, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_repeated", F.lit(0)).cast("long").alias("n_repeated"),
            F.expr(
                "CASE WHEN coalesce(n_grams, 0) <= 0 THEN 0L "
                "ELSE (coalesce(n_repeated, 0) * 10000L) div n_grams END"
            ).alias("rep_bp"),
        )
    )


def repeated_ngrams_sql(
    doc_table: str = "documents", n: int = 5, min_occ: int = 2
) -> str:
    """DuckDB twin of :func:`repeated_ngrams`."""
    return (
        f"WITH grams AS ({_grams_sql(doc_table, n)}), "
        "corpus AS (SELECT g, COUNT(*) AS c FROM grams GROUP BY g), "
        "per_doc AS (SELECT doc_id, g, COUNT(*) AS dc FROM grams"
        " GROUP BY doc_id, g), "
        "rep AS (SELECT p.doc_id, SUM(p.dc) AS n_repeated FROM per_doc p "
        f"JOIN corpus c ON c.g = p.g WHERE c.c >= {min_occ} GROUP BY p.doc_id), "
        "tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id) "
        "SELECT d.doc_id, "
        "CAST(COALESCE(t.n_grams, 0) AS BIGINT) AS n_grams, "
        "CAST(COALESCE(r.n_repeated, 0) AS BIGINT) AS n_repeated, "
        "CAST(CASE WHEN COALESCE(t.n_grams, 0) <= 0 THEN 0 "
        "ELSE (COALESCE(r.n_repeated, 0) * 10000) // t.n_grams END"
        " AS BIGINT) AS rep_bp "
        f"FROM {doc_table} d LEFT JOIN tot t ON t.doc_id = d.doc_id "
        "LEFT JOIN rep r ON r.doc_id = d.doc_id"
    )


def contamination(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-overlap decontamination stats: for every document in
    ``docs``, how many of its DISTINCT word ``n``-grams occur anywhere
    in ``bench`` (the held-out evaluation corpus):

    - ``n_distinct`` — the doc's distinct n-grams;
    - ``n_hit`` — of those, how many appear in the benchmark set;
    - ``contam_bp`` — hit fraction in exact basis points.

    The benchmark gram set is deduped then joined; Spark broadcasts it
    when small (the normal case — benchmarks are tiny next to a
    training corpus), so the corpus side is one distinct + one
    map-side join, no second shuffle."""
    dg = _doc_grams(docs, n, text_col, id_col).distinct()
    bg = (
        _doc_grams(bench, n, text_col, id_col)
        .select("g")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    per = (
        dg.join(bg, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("n_hit"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_distinct", F.lit(0)).cast("long").alias("n_distinct"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.expr(
                "CASE WHEN coalesce(n_distinct, 0) <= 0 THEN 0L "
                "ELSE (coalesce(n_hit, 0) * 10000L) div n_distinct END"
            ).alias("contam_bp"),
        )
    )


def contamination_sql(
    docs_sel: str,
    bench_sel: str,
    n: int = 8,
) -> str:
    """DuckDB twin of :func:`contamination`. ``docs_sel``/``bench_sel``
    are SELECTs yielding (doc_id, text)."""
    return (
        f"WITH dd AS ({docs_sel}), bb AS ({bench_sel}), "
        f"dg AS (SELECT DISTINCT doc_id, g FROM ({_grams_sql('dd', n)})), "
        f"bg AS (SELECT DISTINCT g FROM ({_grams_sql('bb', n)})), "
        "per AS (SELECT d.doc_id, COUNT(*) AS n_distinct, "
        "SUM(CASE WHEN b.g IS NULL THEN 0 ELSE 1 END) AS n_hit "
        "FROM dg d LEFT JOIN bg b ON b.g = d.g GROUP BY d.doc_id) "
        "SELECT x.doc_id, "
        "CAST(COALESCE(p.n_distinct, 0) AS BIGINT) AS n_distinct, "
        "CAST(COALESCE(p.n_hit, 0) AS BIGINT) AS n_hit, "
        "CAST(CASE WHEN COALESCE(p.n_distinct, 0) <= 0 THEN 0 "
        "ELSE (COALESCE(p.n_hit, 0) * 10000) // p.n_distinct END"
        " AS BIGINT) AS contam_bp "
        "FROM dd x LEFT JOIN per p ON p.doc_id = x.doc_id"
    )
