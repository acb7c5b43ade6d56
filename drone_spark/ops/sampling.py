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
