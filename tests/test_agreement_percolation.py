"""Dedup-method agreement audit and md5-deterministic bond percolation
— hand/brute-force oracles + DuckDB twin replays (entry keys
dedup_agreement / bond_percolation)."""

import hashlib

import pytest
from pyspark.sql import functions as F  # noqa: F401

from drone_spark.algorithms.robustness import (
    bond_percolation,
    bond_percolation_sql,
)
from drone_spark.ops.dedup import dedup_agreement, dedup_agreement_sql


def test_dedup_agreement_hand(spark):
    """pa={12,23}, pb={23,34,45}: both=1, only_a=1, only_b=2,
    union=4 → 250000 ppm."""
    pa = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    pb = spark.createDataFrame([(2, 3), (3, 4), (4, 5)], "a long, b long")
    [r] = dedup_agreement(pa, pb).collect()
    assert tuple(r) == (2, 3, 1, 1, 2, 250_000)


def test_dedup_agreement_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    ra = [(i, i + 1) for i in range(0, 30, 2)]
    rb = [(i, i + 1) for i in range(0, 30, 3)]
    pa = spark.createDataFrame(ra, "a long, b long")
    pb = spark.createDataFrame(rb, "a long, b long")
    got = [tuple(r) for r in dedup_agreement(pa, pb).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE ta (a BIGINT, b BIGINT)")
    con.execute("CREATE TABLE tb (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO ta VALUES (?, ?)", ra)
    con.executemany("INSERT INTO tb VALUES (?, ?)", rb)
    want = [
        tuple(r)
        for r in con.execute(
            dedup_agreement_sql("SELECT a, b FROM ta", "SELECT a, b FROM tb")
        ).fetchall()
    ]
    assert got == want


def _u(salt, a, b):
    h = hashlib.md5(f"{salt}:{a}:{b}".encode()).hexdigest()
    return int(h[:15], 16) % 1_000_000


def _cc_sizes(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    sizes = {}
    for v in parent:
        sizes[find(v)] = sizes.get(find(v), 0) + 1
    return sizes


def test_bond_percolation_brute_force(spark, engine):
    """The md5 survival draw is reproduced with hashlib; surviving
    subgraph CC via a python union-find — counts must match exactly."""
    rows = [(u, v) for u in range(1, 16) for v in range(u + 1, 16)
            if (u * v) % 3 != 0]
    e = spark.createDataFrame(rows, "src long, dst long")
    ppms = (300_000, 700_000)
    got = {
        r["keep_ppm"]: (
            r["n_edges_kept"], r["n_vertices"], r["n_components"],
            r["giant_size"],
        )
        for r in bond_percolation(
            spark, engine, e, keep_ppms=ppms, run_id="t_bp"
        ).collect()
    }
    for ppm in ppms:
        kept = [(a, b) for a, b in rows if _u("perc", a, b) < ppm]
        sizes = _cc_sizes(kept)
        want = (
            len(kept),
            sum(sizes.values()),
            len(sizes),
            max(sizes.values()) if sizes else 0,
        )
        assert got[ppm] == want, ppm


def test_bond_percolation_sql_twin(spark, engine):
    duckdb = pytest.importorskip("duckdb")
    rows = [(u, v) for u in range(1, 14) for v in range(u + 1, 14)
            if (u + v) % 4 != 0]
    e = spark.createDataFrame(rows, "src long, dst long")
    got = sorted(
        tuple(r)
        for r in bond_percolation(spark, engine, e, run_id="t_bp2").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE base (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO base VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            bond_percolation_sql("edges AS (SELECT src, dst FROM base)")
        ).fetchall()
    )
    assert got == want


# ----------------------------------------------------- event entropy
def test_event_conditional_entropy_hand(spark):
    """Corpus transition pairs {ab:2, ba:2, cc:1, cd:1} with row sums
    a:2, b:2, c:2 and N=6: the a/b rows are deterministic (c = r, ln 1
    terms), the c row splits evenly, so
    H = (2·ln1 + 2·ln1 + 1·ln2 + 1·ln2)/6 = ln2/3."""
    import datetime
    import math

    from drone_spark.ops.events import event_conditional_entropy

    t0 = datetime.datetime(2024, 1, 1)

    def ts(m):
        return t0 + datetime.timedelta(minutes=m)

    rows = [
        (1, 1, ts(0), "a"), (2, 1, ts(1), "b"), (3, 1, ts(2), "a"),
        (4, 1, ts(3), "b"), (5, 1, ts(4), "a"),
        (6, 2, ts(0), "c"), (7, 2, ts(1), "c"), (8, 2, ts(2), "d"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    [r] = event_conditional_entropy(ev).collect()
    assert (r["n_transitions"], r["n_pairs"]) == (6, 4)
    assert r["cond_entropy"] == pytest.approx(round(2 * math.log(2) / 6, 6))


def test_event_entropy_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    import datetime
    import random

    from drone_spark.ops.events import (
        event_conditional_entropy,
        event_conditional_entropy_sql,
    )

    rng = random.Random(3)
    rows = [
        (
            i,
            rng.randrange(6),
            datetime.datetime(2024, 1, 1)
            + datetime.timedelta(seconds=rng.randrange(86400)),
            rng.choice(["v", "c", "p", "e"]),
        )
        for i in range(300)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = [tuple(r) for r in event_conditional_entropy(ev).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, user_id BIGINT, "
        "ts TIMESTAMP, event_type VARCHAR)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?)", rows)
    want = [
        tuple(r)
        for r in con.execute(event_conditional_entropy_sql()).fetchall()
    ]
    assert got == want


# --------------------------------------------------- site percolation
def test_site_percolation_brute_force(spark, engine):
    """md5 vertex draw replayed with hashlib; kept edges need BOTH
    endpoints alive; python union-find CC must match exactly."""
    from drone_spark.algorithms.robustness import site_percolation

    rows = [(u, v) for u in range(1, 16) for v in range(u + 1, 16)
            if (u * 2 + v) % 3 != 0]
    e = spark.createDataFrame(rows, "src long, dst long")
    ppms = (400_000, 800_000)
    got = {
        r["keep_ppm"]: (
            r["n_vertices_kept"], r["n_edges_kept"], r["n_components"],
            r["giant_size"],
        )
        for r in site_percolation(
            spark, engine, e, keep_ppms=ppms, run_id="t_sp"
        ).collect()
    }

    def uv(x):
        h = hashlib.md5(f"site:{x}".encode()).hexdigest()
        return int(h[:15], 16) % 1_000_000

    for ppm in ppms:
        kept = [
            (a, b) for a, b in rows if uv(a) < ppm and uv(b) < ppm
        ]
        sizes = _cc_sizes(kept)
        want = (
            sum(sizes.values()),
            len(kept),
            len(sizes),
            max(sizes.values()) if sizes else 0,
        )
        assert got[ppm] == want, ppm


def test_site_percolation_sql_twin(spark, engine):
    duckdb = pytest.importorskip("duckdb")
    from drone_spark.algorithms.robustness import (
        site_percolation,
        site_percolation_sql,
    )

    rows = [(u, v) for u in range(1, 14) for v in range(u + 1, 14)
            if (u + 2 * v) % 4 != 0]
    e = spark.createDataFrame(rows, "src long, dst long")
    got = sorted(
        tuple(r)
        for r in site_percolation(spark, engine, e, run_id="t_sp2").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE base (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO base VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            site_percolation_sql("edges AS (SELECT src, dst FROM base)")
        ).fetchall()
    )
    assert got == want


# ------------------------------------------------------ NQC predictor
def test_nqc_hand(spark):
    """Three docs, query {q}: identical single-hit docs of equal
    length → identical scores → variance 0 → NQC = 0; add one doc with
    a double hit and NQC turns positive."""
    from drone_spark.ops.textstats import nqc_predictor

    flat = spark.createDataFrame(
        [(1, "q x"), (2, "q y"), (3, "q z")], "doc_id long, text string"
    )
    [r] = nqc_predictor(flat, ["q"]).collect()
    assert r["k_used"] == 3 and r["nqc"] == pytest.approx(0.0)
    spread = spark.createDataFrame(
        [(1, "q q x"), (2, "q y"), (3, "q z")], "doc_id long, text string"
    )
    [r2] = nqc_predictor(spread, ["q"]).collect()
    assert r2["nqc"] > 0


def test_nqc_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    from drone_spark.ops.textstats import nqc_predictor, nqc_predictor_sql

    rows = [
        (i, " ".join(f"w{(i * 5 + j) % 13}" for j in range(3 + i % 6))
         + (" join hash" if i % 3 == 0 else " join" if i % 5 == 0 else ""))
        for i in range(1, 40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [tuple(r) for r in nqc_predictor(docs, ["join", "hash"]).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = [
        tuple(r)
        for r in con.execute(nqc_predictor_sql(["join", "hash"])).fetchall()
    ]
    assert got == want


# ---------------------------------------------------- MaxScore audit
def _bm25_brute(rows, terms, k=10, k1=1.2, b=0.75):
    """Independent reference: per-doc per-term round-6 contributions,
    theta, upper bounds, prunable count."""
    import math as _m

    toks = {d: t.split() for d, t in rows}
    dl = {d: len(t) for d, t in toks.items() if t}
    n = len(dl)
    avgdl = sum(dl.values()) / n
    tf = {}
    for d, t in toks.items():
        for w in t:
            tf[(d, w)] = tf.get((d, w), 0) + 1
    df = {
        q: len({d for (d, w) in tf if w == q}) for q in terms
    }
    contrib = {}
    for (d, w), f in tf.items():
        if w in terms and df[w] > 0:
            idf = _m.log(1 + (n - df[w] + 0.5) / (df[w] + 0.5))
            sat = f * (k1 + 1) / (f + k1 * (1 - b + b * dl[d] / avgdl))
            contrib[(d, w)] = round(idf * sat, 6)
    scores = {}
    for (d, w), c in contrib.items():
        scores[d] = round(scores.get(d, 0) + c, 10)
    scores = {d: round(s, 6) for d, s in scores.items()}
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    theta = min(s for _, s in top)
    ub = {}
    for (d, w), c in contrib.items():
        ub[w] = max(ub.get(w, 0.0), c)
    bounds = {}
    for (d, w), _ in contrib.items():
        bounds[d] = bounds.get(d, 0.0) + ub[w]
    prunable = sum(1 for d, bd in bounds.items() if bd < theta)
    return theta, len(bounds), prunable


def test_maxscore_brute_force(spark):
    from drone_spark.ops.textstats import maxscore_prunable

    rows = [(i, "q q q q x") if i % 4 == 0
            else (i, "r x y") if i % 4 == 1
            else (i, "q r z") if i % 4 == 2
            else (i, "x y z")
            for i in range(1, 41)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    [r] = maxscore_prunable(docs, ["q", "r"], k=5).collect()
    theta, n_cand, n_prun = _bm25_brute(rows, ["q", "r"], k=5)
    assert r["n_candidates"] == n_cand
    assert r["theta"] == pytest.approx(theta)
    assert r["n_prunable"] == n_prun


def test_maxscore_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    from drone_spark.ops.textstats import (
        maxscore_prunable,
        maxscore_prunable_sql,
    )

    rows = [
        (i, " ".join(f"w{(i * 5 + j) % 13}" for j in range(3 + i % 6))
         + (" join hash" if i % 3 == 0 else " join" if i % 5 == 0 else ""))
        for i in range(1, 60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        tuple(r) for r in maxscore_prunable(docs, ["join", "hash"]).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = [
        tuple(r)
        for r in con.execute(
            maxscore_prunable_sql(["join", "hash"])
        ).fetchall()
    ]
    assert got == want
