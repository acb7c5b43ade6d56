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

from pyspark.sql import Column, DataFrame, functions as F

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
