"""Probabilistic sketch trio (ops/sketches.py): HyperLogLog distinct,
Count–Min heavy hitters, Bloom prefilter.

Each test pins the sketch's *defining inequality* (HLL relative error
within the m=64 bound, CMS never underestimates, Bloom never produces a
false negative) on deterministic synthetic data, plus a plan pin that
the whole trio stays JVM-side (no Python eval nodes — the 100 TB hot
path is pure codegen)."""

import pytest
from pyspark.sql import functions as F

from drone_spark.ops.sketches import (
    bloom_prefilter,
    cms_heavy_hitters,
    hll_distinct,
)


@pytest.fixture(scope="module")
def zipfy(spark):
    """Deterministic skewed stream: value v appears ~1000/v times for
    v in 1..60 (heavy head), plus a long tail of singletons."""
    head = spark.range(1, 61).selectExpr(
        "explode(sequence(1, cast(1000 / id as int))) as rep", "id as v"
    )
    tail = spark.range(10_000, 12_000).select(F.col("id").alias("v"))
    return head.select("v").unionAll(tail).withColumn("g", F.lit("all"))


def test_hll_within_error_bound(spark, zipfy):
    """HLL with m=64 has theoretical RSE 1.04/sqrt(64) = 13 %; assert
    the estimate lands within 4 sigma of the exact distinct count."""
    row = hll_distinct(zipfy, "g", "v").collect()[0]
    exact = row["exact_distinct"]
    assert exact == 60 + 2000
    assert abs(row["est_distinct"] - exact) / exact < 0.52


def test_hll_grouped_registers_bounded(spark):
    """Grouped HLL: per-group estimates are independent; a group with
    one distinct value must estimate via linear counting ≈ 1."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 1)] + [("b", i) for i in range(500)],
        "g string, v long",
    )
    out = {r["g"]: r for r in hll_distinct(df, "g", "v").collect()}
    assert out["a"]["est_distinct"] == 1  # LC branch: 64*ln(64/63) floors to 1
    assert out["a"]["exact_distinct"] == 1
    assert abs(out["b"]["est_distinct"] - 500) / 500 < 0.52


def test_cms_overestimates_only(spark, zipfy):
    """Count–Min estimates are min-over-rows of non-negative counters
    sharing cells: est >= exact always, and exact for the very heavy
    head (collisions with singleton tail add at most the tail mass)."""
    rows = cms_heavy_hitters(zipfy, "v", k=20).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["cms_est"] >= r["exact_cnt"]
    # the top hitter (v=1, count 1000) is found
    top = max(rows, key=lambda r: r["exact_cnt"])
    assert top["v"] == 1 and top["exact_cnt"] == 1000


def test_bloom_no_false_negatives(spark):
    members = spark.range(0, 300).select((F.col("id") * 7).alias("v"))
    cands = spark.range(0, 4000).select(F.col("id").alias("v"))
    out = bloom_prefilter(members, cands, "v").collect()
    assert len(out) == 4000
    fps = 0
    for r in out:
        if r["exact_hit"] == 1:
            assert r["bloom_hit"] == 1, f"false negative at {r['v']}"
        elif r["bloom_hit"] == 1:
            fps += 1
    # m=4096, k=3, n=300 → FPR ≈ (1-e^{-0.22})^3 ≈ 0.8 %; allow 3 %
    assert fps / 3700 < 0.03


def test_sketches_plan_is_jvm_only(spark, zipfy):
    """No Python eval nodes anywhere in the three sketch plans."""
    members = spark.range(0, 50).select(F.col("id").alias("v"))
    cands = spark.range(0, 200).select(F.col("id").alias("v"))
    for df in (
        hll_distinct(zipfy, "g", "v"),
        cms_heavy_hitters(zipfy, "v", k=5),
        bloom_prefilter(members, cands, "v"),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_hll_registers_merge_by_max(spark):
    """The distributed-merge property that makes HLL shuffle-free:
    registers of A∪B equal the element-wise max of A's and B's
    registers — so partial sketches combine associatively (map-side),
    and the union estimate needs no re-scan of raw values."""
    from drone_spark.ops.sketches import HLL_M, HLL_P, HLL_W, _h60

    def regs(df):
        h = _h60("v", "hll:")
        r = (
            df.select(
                h.bitwiseAND(HLL_M - 1).alias("j"),
                F.shiftright(h, HLL_P).alias("w"),
            )
            .select(
                "j",
                F.when(F.col("w") == 0, F.lit(HLL_W + 1))
                .otherwise(F.lit(HLL_W + 1) - F.length(F.bin("w")))
                .alias("rank"),
            )
            .groupBy("j")
            .agg(F.max("rank").alias("m"))
            .collect()
        )
        return {x["j"]: x["m"] for x in r}

    a = spark.range(0, 400).select(F.col("id").alias("v"))
    b = spark.range(300, 700).select(F.col("id").alias("v"))
    ra, rb, ru = regs(a), regs(b), regs(a.union(b))
    merged = {
        j: max(ra.get(j, 0), rb.get(j, 0)) for j in set(ra) | set(rb)
    }
    assert ru == merged
