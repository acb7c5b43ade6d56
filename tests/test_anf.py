"""ANF sketch correctness: brute-force FM math, reachability semantics,
layout independence, estimate sanity."""

import hashlib

from pyspark.sql import functions as F

from drone_spark.algorithms.anf import _HASH_BITS, anf_estimate, anf_sketches


def _bit(vid, r):
    h = int(hashlib.md5(f"anf{r}:{vid}".encode()).hexdigest()[:15], 16)
    if h == 0:
        return 1 << _HASH_BITS
    p = _HASH_BITS - h.bit_length()  # leading zeros of the 60-bit value
    return 1 << p


def _brute_sketches(edges, rounds, registers=4):
    adj = {}
    vs = set()
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        vs |= {s, d}
    st = {v: [_bit(v, r) for r in range(registers)] for v in vs}
    for _ in range(rounds):
        nxt = {}
        for v in vs:
            acc = list(st[v])
            for u in adj.get(v, ()):
                for r in range(registers):
                    acc[r] |= st[u][r]
            nxt[v] = acc
        st = nxt
    return st


EDGES = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (1, 6), (6, 7), (8, 1)]


def test_anf_matches_brute(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r.vid: [r.s0, r.s1, r.s2, r.s3]
        for r in anf_sketches(df, rounds=3).collect()
    }
    assert got == _brute_sketches(EDGES, 3)


def test_anf_round0_is_self_bit(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.vid: r.s0 for r in anf_sketches(df, rounds=0).collect()}
    assert got == {v: _bit(v, 0) for v in got}


def test_anf_saturates_to_reachable_set(spark):
    """After ≥ diameter rounds the sketch equals the OR of the bits of
    every reachable vertex — ANF's defining semantics."""
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r.vid: [r.s0, r.s1, r.s2, r.s3]
        for r in anf_sketches(df, rounds=10).collect()
    }
    # brute reachability closure
    adj = {}
    vs = set()
    for s, d in EDGES:
        adj.setdefault(s, set()).add(d)
        vs |= {s, d}
    for v in vs:
        seen, stack = {v}, [v]
        while stack:
            x = stack.pop()
            for u in adj.get(x, ()):
                if u not in seen:
                    seen.add(u)
                    stack.append(u)
        want = [0, 0, 0, 0]
        for u in seen:
            for r in range(4):
                want[r] |= _bit(u, r)
        assert got[v] == want, f"vertex {v}"


def test_anf_layout_independent(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    a = sorted(map(tuple, anf_sketches(df, rounds=3).collect()))
    b = sorted(map(tuple, anf_sketches(df.repartition(5, "dst"), rounds=3).collect()))
    assert a == b


def test_anf_estimate_order_of_magnitude(spark, small_edges):
    """On the generated page graph, big-neighborhood vertices should
    estimate larger than isolated-ish ones; the estimate must be
    positive and finite everywhere."""
    sk = anf_sketches(small_edges, rounds=4)
    est = anf_estimate(sk)
    bad = est.where(
        F.col("anf_est").isNull() | (F.col("anf_est") <= 0)
    ).count()
    assert bad == 0
