"""Chi-square independence (milli fixed point) and per-group top-k."""

from pyspark.sql import functions as F


def _chi2_milli(rows):
    """Python replica of the per-cell floored statistic."""
    from collections import Counter

    n = len(rows)
    obs = Counter(rows)
    r = Counter(l for l, _ in rows)
    c = Counter(s for _, s in rows)
    total = 0
    for li in r:
        for si in c:
            o = obs.get((li, si), 0)
            num = 1000 * (n * o - r[li] * c[si]) ** 2
            total += num // (n * r[li] * c[si])
    return total


def test_chi2_independent_table_is_zero(spark):
    """Perfectly proportional table → every cell n·o = r·c → χ² = 0."""
    rows = [("en", "a")] * 4 + [("en", "b")] * 4 + [("de", "a")] * 2 + [
        ("de", "b")
    ] * 2
    docs = spark.createDataFrame(
        [(i, l, s) for i, (l, s) in enumerate(rows)],
        "doc_id long, lang string, source string",
    )
    obs = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    r = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("r"))
    c = docs.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    n = docs.count()
    grid = r.crossJoin(c).join(obs, ["lang", "source"], "left").select(
        "r", "c", F.coalesce("o", F.lit(0)).alias("o")
    )
    cell = F.expr(
        f"(1000 * ({n} * o - r * c) * ({n} * o - r * c)) DIV ({n} * r * c)"
    )
    got = grid.agg(F.sum(cell)).collect()[0][0]
    assert got == 0
    assert _chi2_milli(rows) == 0


def test_chi2_replica_on_skewed_table(spark):
    rows = [("en", "a")] * 9 + [("de", "b")] * 9 + [("en", "b")] + [("de", "a")]
    want = _chi2_milli(rows)
    assert want > 0  # strongly dependent table
    docs = spark.createDataFrame(
        [(i, l, s) for i, (l, s) in enumerate(rows)],
        "doc_id long, lang string, source string",
    )
    obs = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    r = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("r"))
    c = docs.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    n = docs.count()
    grid = r.crossJoin(c).join(obs, ["lang", "source"], "left").select(
        "r", "c", F.coalesce("o", F.lit(0)).alias("o")
    )
    cell = F.expr(
        f"(1000 * ({n} * o - r * c) * ({n} * o - r * c)) DIV ({n} * r * c)"
    )
    got = grid.agg(F.sum(cell)).collect()[0][0]
    assert got == want


def test_per_group_topk_window_partitions(spark):
    """The per-host rank window must be PARTITIONED (no single-task
    global sort): assert the physical plan's Sort is within partitions
    (no global Exchange into one range partition for the window)."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i, i % 7, (i * 31) % 100) for i in range(200)],
        "vid long, host long, score long",
    )
    w = Window.partitionBy("host").orderBy(F.desc("score"), F.asc("vid"))
    out = df.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= 3)
    rows = out.collect()
    assert len(rows) == 21  # 7 hosts × 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(host" in plan  # window keyed by host, not global


def test_cross_source_dups_symmetric_canonical(spark):
    """Shared 40-char openings across sources count once per doc pair
    with canonical (least, greatest) source order."""
    from __spark_entry__ import q_cross_source_dups  # noqa: F401
    from pyspark.sql import functions as F

    head = "x " * 25  # 50 chars, same 40-char opening
    docs = spark.createDataFrame(
        [
            (1, head + "alpha", "en", "s1", 1),
            (2, head + "beta", "en", "s2", 1),
            (3, head + "gamma", "en", "s2", 1),
            (4, "totally different text", "en", "s3", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = docs.select(
        "doc_id", "source",
        F.md5(F.substring(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "),
            1, 40)).alias("fp"),
    )
    x, y = d.alias("x"), d.alias("y")
    out = {(r["src_a"], r["src_b"]): r["n_pairs"] for r in (
        x.join(y, "fp")
        .where((F.col("x.doc_id") < F.col("y.doc_id"))
               & (F.col("x.source") != F.col("y.source")))
        .select(F.least("x.source", "y.source").alias("src_a"),
                F.greatest("x.source", "y.source").alias("src_b"))
        .groupBy("src_a", "src_b").agg(F.count(F.lit(1)).alias("n_pairs"))
        .collect())}
    assert out == {("s1", "s2"): 2}
