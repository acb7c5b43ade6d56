"""Unigram surprisal, source KL, dictionary front coding, weighted
priority sampling — Python-replica oracles (hashlib/math reproduce the
exact md5/floored-log integer math) plus structural invariants."""

import hashlib
import math

from pyspark.sql import functions as F

from drone_spark.ops.corpusstats import (
    dict_frontcoding,
    source_kl,
    unigram_surprisal,
)
from drone_spark.ops.sampling import weighted_priority_sample


def test_surprisal_hand_oracle(spark):
    """Corpus: doc1 = 'a a b', doc2 = 'b c'. N=5, c: a=2,b=2,c=1.
    s(a)=s(b)=floor(1e6·ln(2.5)), s(c)=floor(1e6·ln(5))."""
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    sa = math.floor(1e6 * math.log(5 / 2))
    sc = math.floor(1e6 * math.log(5 / 1))
    out = {r["doc_id"]: r for r in unigram_surprisal(docs).collect()}
    assert out[1]["n_tokens"] == 3
    assert out[1]["mean_surprisal_micro"] == (3 * sa) // 3
    assert out[2]["n_tokens"] == 2
    assert out[2]["mean_surprisal_micro"] == (sa + sc) // 2


def test_source_kl_identical_source_is_zero(spark):
    """A source distributed exactly like the corpus has every
    ln-ratio = 0 ⇒ KL exactly 0 (floors of 0 stay 0)."""
    docs = spark.createDataFrame(
        [(1, "a b", "s1"), (2, "a b", "s2")],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r["kl_micro"] for r in source_kl(docs).collect()}
    assert out == {"s1": 0, "s2": 0}


def test_source_kl_divergent_source_positive(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a", "s1"), (2, "b b b b", "s2")],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r["kl_micro"] for r in source_kl(docs).collect()}
    # p_s(t)=1 vs p(t)=0.5 → ln 2 per token ⇒ 693147 micro-nats
    assert out["s1"] == math.floor(1e6 * math.log(2))
    assert out["s2"] == out["s1"]


def test_dict_frontcoding_hand_oracle(spark):
    """Vocab {car, cart, cat, dog}: block c sorted = car, cart, cat.
    raw = 3+4+3 = 10; coded = 3 (head) + (1+4-3) + (1+3-2) = 7.
    Block d: raw = coded = 3."""
    docs = spark.createDataFrame(
        [(1, "car cart cat dog")], "doc_id long, text string"
    )
    out = {r["block"]: r for r in dict_frontcoding(docs).collect()}
    assert out["c"]["n_terms"] == 3
    assert out["c"]["raw_bytes"] == 10
    assert out["c"]["coded_bytes"] == 7
    assert out["d"]["raw_bytes"] == 3 and out["d"]["coded_bytes"] == 3


def _priority(doc_id: int, weight: int) -> int:
    h = int(hashlib.md5(f"wps:{doc_id}".encode()).hexdigest()[:15], 16)
    u = float(h + 1) / float(1 << 60)
    return math.floor(1e12 * math.log(u) / weight)


def test_weighted_sample_matches_python_replica(spark):
    rows = [(i, 10 + (i * 37) % 90) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = [
        (r["doc_id"], r["weight"], r["key_fx"])
        for r in weighted_priority_sample(docs, k=10).collect()
    ]
    want = sorted(
        ((i, w, _priority(i, w)) for i, w in rows),
        key=lambda t: (-t[2], t[0]),
    )[:10]
    assert got == want


def test_weighted_sample_prefers_heavy_rows(spark):
    """1000 rows of weight 1 vs 50 rows of weight 10^6: the heavy rows
    should dominate the top-20 overwhelmingly."""
    rows = [(i, 1) for i in range(1000)] + [
        (10_000 + i, 1_000_000) for i in range(50)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = weighted_priority_sample(docs, k=20).collect()
    heavy = sum(1 for r in got if r["doc_id"] >= 10_000)
    assert heavy >= 18
