"""Deterministic sampling + PII redaction."""

import pytest
from pyspark.sql import functions as F

from drone_spark.ops.sampling import (
    deterministic_sample,
    sample_bucket,
    stratified_sample,
)
from drone_spark.ops.textstats import redact_pii


def test_sample_is_layout_independent(spark):
    df = spark.range(5000).select(F.col("id").alias("k"))
    a = sorted(r["k"] for r in deterministic_sample(df, "k", 0.3).collect())
    b = sorted(
        r["k"]
        for r in deterministic_sample(df.repartition(17), "k", 0.3).collect()
    )
    assert a == b and len(a) > 0


def test_sample_rate_accuracy_and_nesting(spark):
    df = spark.range(20000).select(F.col("id").alias("k"))
    n30 = deterministic_sample(df, "k", 0.3).count()
    n10 = deterministic_sample(df, "k", 0.1).count()
    assert n30 / 20000 == pytest.approx(0.3, abs=0.02)
    assert n10 / 20000 == pytest.approx(0.1, abs=0.02)
    # threshold sampling nests: the 10% sample is a subset of the 30%
    k10 = {r["k"] for r in deterministic_sample(df, "k", 0.1).collect()}
    k30 = {r["k"] for r in deterministic_sample(df, "k", 0.3).collect()}
    assert k10 <= k30


def test_sample_consistent_across_tables(spark):
    """Hash-sampling by the same key keeps two tables join-compatible."""
    left = spark.range(3000).select(F.col("id").alias("k"), F.lit("l").alias("t"))
    right = spark.range(3000).select(F.col("id").alias("k"), F.lit("r").alias("t"))
    kl = {r["k"] for r in deterministic_sample(left, "k", 0.25).collect()}
    kr = {r["k"] for r in deterministic_sample(right, "k", 0.25).collect()}
    assert kl == kr


def test_sample_salt_changes_selection(spark):
    df = spark.range(5000).select(F.col("id").alias("k"))
    a = {r["k"] for r in deterministic_sample(df, "k", 0.2, salt="s0").collect()}
    b = {r["k"] for r in deterministic_sample(df, "k", 0.2, salt="s1").collect()}
    assert a != b  # independent samples from independent salts


def test_stratified_rates_and_default(spark):
    df = spark.range(9000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("xx")
        .alias("lang"),
    )
    out = stratified_sample(df, "lang", "k", {"en": 0.5, "de": 0.1}, default_rate=0.0)
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_lang.get("xx", 0) == 0  # default 0 drops unlisted strata
    assert by_lang["en"] / 3000 == pytest.approx(0.5, abs=0.04)
    assert by_lang["de"] / 3000 == pytest.approx(0.1, abs=0.03)


def test_sample_bad_rate_raises(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        deterministic_sample(df, "k", 1.5)
    with pytest.raises(ValueError):
        stratified_sample(df, "k", "k", {"a": -0.1})


def test_redact_pii_exact(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "call +1 555-0199 or 44 123-4567 thanks"),
            (3, "host 192.168.0.1 and 10.0.255.7 up"),
            (4, "clean text, no pii at all"),
            (5, "a@b.io from 127.0.0.1 dial 1 234-5678"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert rows[1]["n_emails"] == 1 and rows[1]["redacted"] == "mail [EMAIL] now"
    assert rows[2]["n_phones"] == 2
    assert rows[2]["redacted"] == "call [PHONE] or [PHONE] thanks"
    assert rows[3]["n_ips"] == 2 and rows[3]["redacted"] == "host [IP] and [IP] up"
    assert (
        rows[4]["n_emails"] == rows[4]["n_phones"] == rows[4]["n_ips"] == 0
        and rows[4]["redacted"] == "clean text, no pii at all"
    )
    assert (
        rows[5]["n_emails"] == 1
        and rows[5]["n_ips"] == 1
        and rows[5]["n_phones"] == 1
        and rows[5]["redacted"] == "[EMAIL] from [IP] dial [PHONE]"
    )


def test_sampling_and_redaction_pure_codegen(spark):
    df = spark.range(100).select(
        F.col("id").alias("k"), F.lit("x").alias("lang"), F.lit("t").alias("text")
    )
    for out in (
        deterministic_sample(df, "k", 0.5),
        stratified_sample(df, "lang", "k", {"x": 0.5}),
        redact_pii(df.select(F.col("k").alias("doc_id"), "text")),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "Exchange" not in plan


def test_group_cap_exact_quota_and_layout_independence(spark):
    from drone_spark.ops.sampling import group_cap

    rows = [(i, f"host{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = group_cap(df, "source", "doc_id", k=4)
    got = kept.groupBy("source").count().collect()
    assert {r["count"] for r in got} == {4} and len(got) == 3
    # bit-identical on a different layout
    a = sorted(map(tuple, kept.collect()))
    b = sorted(map(tuple, group_cap(df.repartition(7, "doc_id"),
                                    "source", "doc_id", k=4).collect()))
    assert a == b
    # groups under quota keep everything
    small = group_cap(df.where("doc_id < 5"), "source", "doc_id", k=4)
    assert small.count() == 5


def test_group_cap_two_phase_equals_global_window_twin(spark):
    import duckdb

    from drone_spark.ops.sampling import group_cap, group_cap_sql

    rows = [(i, f"h{i % 5}") for i in range(97)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(map(tuple, group_cap(
        df, "source", "doc_id", k=3, buckets=4).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, source VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(map(tuple, con.execute(group_cap_sql(
        "source", "doc_id", k=3, out_cols="doc_id, source")).fetchall()))
    assert got == want


# --------------------------------------------------------- pack_bins
def test_pack_bins_matches_naive_prefix_sum(spark):
    """The two-level scan equals a driver-side replay of the naive
    global prefix sum in (md5-bucket, md5) order."""
    import hashlib

    from drone_spark.ops.sampling import pack_bins

    texts = [(i, "tok " * (i % 7)) for i in range(60)]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["bin_id"], r["bin_offset"])
        for r in pack_bins(docs, budget_tokens=10, n_buckets=16).collect()
    }
    def key(i):
        k = hashlib.md5(str(i).encode()).hexdigest()
        return (int(k[:4], 16) % 16, k)
    order = sorted(range(60), key=key)
    cum = 0
    for i in order:
        n = i % 7  # "tok " * n has n tokens (trailing space trimmed)
        assert got[i] == (n, cum // 10, cum % 10), (i, got[i], cum)
        cum += n


def test_pack_bins_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    from drone_spark.ops.sampling import pack_bins, pack_bins_sql

    texts = [(i, ("w%d " % i) * (i % 11)) for i in range(80)]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = sorted(
        tuple(r)
        for r in pack_bins(docs, budget_tokens=32, n_buckets=8).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", texts)
    want = sorted(
        tuple(r)
        for r in con.execute(
            pack_bins_sql(budget_tokens=32, n_buckets=8)
        ).fetchall()
    )
    assert got == want
