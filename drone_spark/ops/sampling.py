"""Deterministic sampling — the reproducibility primitive of a
training-data pipeline.

``df.sample()`` is seed-dependent AND partitioning-dependent (the seed
mixes with the partition index), so the same corpus sampled on two
cluster layouts yields different rows — unacceptable for dataset
curation, where a sample must be re-derivable from the data alone.
These operators key the decision on a content hash of a stable key
column instead: a row's fate depends only on (salt, key), identical on
any layout, any engine (the md5 idiom shared with ops/dedup.py — SQL
twin ``('0x' || substr(md5(...), 1, 15))::BIGINT``), and any future
re-run. That also makes samples *consistent across tables*: sampling
two tables by the same key keeps them join-compatible (the classic
hash-sample property).

Pure codegen expressions — the filter pushes into the scan, so at
100 TB a 1% sample reads ~1% of row groups when the key correlates
with file layout, and never shuffles anything.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

BUCKETS = 1_000_000  # ppm resolution


def sample_bucket(key: Column, salt: str = "s0") -> Column:
    """Stable per-row bucket in [0, 1e6): hash of (salt, key)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(BUCKETS))


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = "s0"
) -> DataFrame:
    """Keep ~``rate`` of rows, decided by the key hash alone."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.where(sample_bucket(F.col(key_col), salt) < int(round(rate * BUCKETS)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum rates (e.g. per-language quotas when rebalancing a
    web corpus): ``rates`` maps stratum value → keep fraction; strata
    not listed fall back to ``default_rate``. The threshold is a
    broadcast-free CASE expression — whole-stage codegen, no join."""
    for stratum, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {stratum!r} must be in [0, 1], got {rate}")
    thr = F.lit(int(round(default_rate * BUCKETS)))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(int(round(rate * BUCKETS)))
        ).otherwise(thr)
    return df.where(sample_bucket(F.col(key_col), salt) < thr)


def group_cap(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    salt: str = "gc0",
    buckets: int = 16,
) -> DataFrame:
    """Keep at most ``k`` rows per group, chosen deterministically —
    the per-domain document cap every webtext pipeline applies (C4 /
    RefinedWeb-style: no single host may dominate the corpus). The
    kept rows are those with the smallest md5(salt, key): statistically
    a uniform without-replacement quota, bit-identical on any
    partitioning, engine, or re-run (same contract as
    :func:`deterministic_sample`).

    Hub-safe two-phase exact top-k (the pattern of
    walks.hash_topk_adjacency): rows first rank inside
    (group, hash-bucket) windows — a 10⁸-doc host sorts as ``buckets``
    independent partitions instead of one skewed one — then the
    ≤ buckets·k survivors per group rank globally. Both phases exact,
    so the result equals the single global window the SQL twin runs."""
    from pyspark.sql import Window

    cols = df.columns
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))),
            1, 15,
        ), 16, 10,
    ).cast("long")
    e = df.withColumn("_h", h).withColumn("_b", F.pmod(F.col("_h"), F.lit(buckets)))
    w1 = Window.partitionBy(group_col, "_b").orderBy("_h", key_col)
    local = e.withColumn("_rn", F.row_number().over(w1)).where(F.col("_rn") <= k)
    w2 = Window.partitionBy(group_col).orderBy("_h", key_col)
    return (
        local.withColumn("_rn2", F.row_number().over(w2))
        .where(F.col("_rn2") <= k)
        .select(*cols)
    )


def group_cap_sql(
    group_expr: str,
    key_col: str,
    k: int,
    salt: str = "gc0",
    table: str = "documents",
    out_cols: str = "*",
) -> str:
    """DuckDB twin of :func:`group_cap` (single global window)."""
    h = f"('0x' || substr(md5('{salt}:' || CAST({key_col} AS VARCHAR)), 1, 15))::BIGINT"
    return (
        f"SELECT {out_cols} FROM ("
        f"SELECT *, ROW_NUMBER() OVER (PARTITION BY {group_expr} "
        f"ORDER BY {h}, {key_col}) AS _rn FROM {table}) WHERE _rn <= {k}"
    )


def pack_bins(
    docs: DataFrame,
    budget_tokens: int = 2048,
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """Token-offset sharding — the sequence-packing preprocessing step
    of LLM training pipelines (concatenate the corpus in a fixed
    deterministic order, then cut every ``budget_tokens``): each doc is
    assigned the bin that contains its FIRST token. Result: (doc_id,
    n_tokens, bin_id, bin_offset) with bin_id = ⌊cum_before/budget⌋ and
    bin_offset = cum_before mod budget, where cum_before is the
    exclusive prefix sum of token counts in md5(doc_id) order (the
    repo's deterministic-uniform order — id order would pack crawl
    batches together, md5 interleaves sources).

    The global prefix sum is the classic single-task window trap: a
    bare ``SUM OVER (ORDER BY …)`` with no PARTITION BY drags the whole
    corpus through ONE task. This computes it as the textbook two-level
    scan instead: (1) per-bucket cumsum windowed inside ``n_buckets``
    md5-prefix buckets (parallel, each bucket ~N/buckets rows), (2) an
    ``n_buckets``-row bucket-total table cumsum'd and broadcast back —
    O(N) work, O(buckets) driver-free coordination, the same plan at
    100 TB with n_buckets raised to match the cluster. Values are
    IDENTICAL to the naive global window (the twin uses DuckDB's
    single-node global window to prove it).

    Empty docs (0 tokens) still get a position (they consume no
    budget). Token counts use the shared normalizer's whitespace
    tokens (textstats.token_count).
    """
    from .textstats import token_count

    keyed = docs.select(
        "doc_id",
        token_count(text_col).cast("long").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("k"),
    ).withColumn(
        "bucket",
        F.conv(F.substring("k", 1, 4), 16, 10).cast("long") % n_buckets,
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = keyed.withColumn(
        "local_before", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
    )
    totals = keyed.groupBy("bucket").agg(
        F.sum("n_tokens").alias("btotal")
    )
    w_b = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "bucket",
        F.coalesce(F.sum("btotal").over(w_b), F.lit(0)).alias("boffset"),
    )
    return (
        local.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            ((F.col("boffset") + F.col("local_before")) / budget_tokens)
            .cast("long")
            .alias("bin_id"),
            ((F.col("boffset") + F.col("local_before")) % budget_tokens)
            .cast("long")
            .alias("bin_offset"),
        )
    )


def pack_bins_sql(
    budget_tokens: int = 2048,
    doc_table: str = "documents",
    n_buckets: int = 256,
) -> str:
    """DuckDB twin of :func:`pack_bins` — the NAIVE single-node global
    window over the same md5 order, proving the two-level scan computes
    identical values. Token counts mirror token_count (0 for blank)."""
    from .textstats import NORM_SQL

    return (
        f"WITH keyed AS (SELECT doc_id, CAST(CASE WHEN {NORM_SQL} = ''"
        f" THEN 0 ELSE length({NORM_SQL}) -"
        f" length(replace({NORM_SQL}, ' ', '')) + 1 END AS BIGINT)"
        " AS n_tokens, md5(CAST(doc_id AS VARCHAR)) AS k"
        f" FROM {doc_table}), "
        "cum AS (SELECT doc_id, n_tokens, COALESCE(SUM(n_tokens) OVER ("
        "ORDER BY ('0x' || substr(k, 1, 4))::BIGINT % "
        f"{n_buckets}, k"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
        " AS before FROM keyed) "
        "SELECT doc_id, n_tokens,"
        f" CAST(before // {budget_tokens} AS BIGINT) AS bin_id,"
        f" CAST(before % {budget_tokens} AS BIGINT) AS bin_offset FROM cum"
    )


def weighted_priority_sample(
    docs: DataFrame,
    k: int = 50,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    salt: str = "wps:",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis priority sampling, IPL 2006): each row draws
    u ∈ (0,1] from the md5 hash of its id and takes priority u^(1/w);
    the top-k priorities ARE a weight-proportional sample. Priorities
    are compared in the log domain as the scaled integer
    FLOOR(1e12·ln(u)/w) (monotone in u^(1/w)), so the DuckDB twin
    hash-matches and ties break on id.

    This is how a 100 TB pipeline takes an importance-weighted corpus
    sample in ONE pass with no RNG state: the top-k is
    TakeOrderedAndProject (per-partition heap), never a global sort,
    and re-running with the same salt reproduces the sample exactly —
    lineage-friendly (the north rule's resumability story applies to
    sampling too)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    key = F.floor(
        F.lit(1_000_000_000_000) * F.log(u) / F.col(weight_col)
    ).cast("long")
    return (
        docs.where(F.col(weight_col) > 0)
        .select(id_col, F.col(weight_col).alias("weight"), key.alias("key_fx"))
        .orderBy(F.desc("key_fx"), F.asc(id_col))
        .limit(k)
    )


def weighted_priority_sample_sql(
    k: int = 50,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    doc_table: str = "documents",
    salt: str = "wps:",
) -> str:
    """DuckDB twin of :func:`weighted_priority_sample`."""
    h = (
        f"('0x' || substr(md5('{salt}' || CAST({id_col} AS VARCHAR)), 1, 15))::BIGINT"
    )
    return (
        f"WITH keyed AS (SELECT {id_col}, {weight_col} AS weight, "
        f"CAST(FLOOR(1000000000000 * LN(CAST({h} + 1 AS DOUBLE) / {float(1 << 60)}) "
        f"/ {weight_col}) AS BIGINT) AS key_fx "
        f"FROM {doc_table} WHERE {weight_col} > 0) "
        f"SELECT * FROM keyed ORDER BY key_fx DESC, {id_col} ASC LIMIT {k}"
    )
