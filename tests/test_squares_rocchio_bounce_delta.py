"""4-cycle census, Rocchio expansion, bounce rate, Burrows' Delta —
hand oracles + DuckDB twin replays (entry keys square_count /
rocchio_terms / bounce_rate / burrows_delta)."""

import datetime
import math

import pytest

from drone_spark.algorithms.linkstats import square_count, square_count_sql
from drone_spark.ops.corpusstats import burrows_delta, burrows_delta_sql
from drone_spark.ops.events import bounce_rate, bounce_rate_sql
from drone_spark.ops.textstats import rocchio_terms, rocchio_terms_sql


# ------------------------------------------------------------ squares
def test_square_count_c4_and_k4(spark):
    """A plain 4-cycle has diagonals (1,3),(2,4) each with cn=2 →
    Σ C(2,2)=2 incidences → 1 square. K4 contains 3 distinct C4s
    (6 pairs × C(2,2)=1 → 6 incidences)."""
    c4 = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "src long, dst long"
    )
    [r] = square_count(c4).collect()
    assert (r["diagonal_incidences"], r["n_squares"]) == (2, 1)
    k4 = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)], "src long, dst long"
    )
    [r] = square_count(k4).collect()
    assert (r["diagonal_incidences"], r["n_squares"]) == (6, 3)


def test_square_count_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = [(1, 2), (2, 3), (3, 4), (1, 4), (4, 5), (5, 6), (6, 3),
            (1, 5), (2, 6)]
    e = spark.createDataFrame(rows, "src long, dst long")
    got = [tuple(r) for r in square_count(e).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE base (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO base VALUES (?, ?)", rows)
    want = [
        tuple(r)
        for r in con.execute(
            square_count_sql("edges AS (SELECT src, dst FROM base)")
        ).fetchall()
    ]
    assert got == want


# ------------------------------------------------------------ rocchio
def test_rocchio_hand(spark):
    """Query {a}, top-2 docs = {1, 2} (only docs containing 'a').
    N=3; df(a)=2, df(b)=df(c)=1. Weights: a → (2+1)·ln(3/2)/2,
    b → 1·ln(3)/2, c → 1·ln(3)/2 (tie → token asc); d never appears
    in the top docs."""
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "d")], "doc_id long, text string"
    )
    got = [tuple(r) for r in rocchio_terms(docs, ["a"], k_docs=2).collect()]
    wa = round(3 * math.log(3 / 2) / 2, 6)
    wb = round(math.log(3.0) / 2, 6)
    assert got == [
        ("a", 2, pytest.approx(wa)),
        ("b", 1, pytest.approx(wb)),
        ("c", 1, pytest.approx(wb)),
    ]


def test_rocchio_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = [
        (i, " ".join(f"w{(i * 5 + j) % 13}" for j in range(3 + i % 4))
         + (" join hash" if i % 3 == 0 else ""))
        for i in range(1, 30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r)
        for r in rocchio_terms(docs, ["join", "hash"], k_docs=5).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            rocchio_terms_sql(["join", "hash"], k_docs=5)
        ).fetchall()
    )
    assert got == want


# ------------------------------------------------------------- bounce
def _ts(day, h, m):
    return datetime.datetime(2024, 1, day, h, m)


def test_bounce_rate_hand(spark):
    """u1: (10:00, 10:10) one session, 13:00 a bounce. u2: 23:50 →
    00:05 next day is ONE 2-event session attributed to day 1. Day 1:
    3 sessions, 1 bounce → 333333 ppm."""
    rows = [
        (1, 1, _ts(1, 10, 0)),
        (2, 1, _ts(1, 10, 10)),
        (3, 1, _ts(1, 13, 0)),
        (4, 2, _ts(1, 23, 50)),
        (5, 2, _ts(2, 0, 5)),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = [tuple(r) for r in bounce_rate(ev).collect()]
    assert got == [("2024-01-01", 3, 1, 333333)]


def test_bounce_rate_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    import random

    rng = random.Random(11)
    rows = [
        (
            i,
            rng.randrange(5),
            datetime.datetime(2024, 1, 1)
            + datetime.timedelta(seconds=rng.randrange(0, 4 * 86400)),
        )
        for i in range(200)
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = sorted(tuple(r) for r in bounce_rate(ev).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, user_id BIGINT, ts TIMESTAMP)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?)", rows)
    want = sorted(tuple(r) for r in con.execute(bounce_rate_sql()).fetchall())
    assert got == want


# -------------------------------------------------------------- delta
def test_burrows_delta_identical_sources_closest(spark):
    """Sources A and B share an identical token profile; C diverges.
    Δ(A,B) = 0 and it ranks first; Δ(A,C) = Δ(B,C) > 0."""
    docs = spark.createDataFrame(
        [
            (1, "x x y z z z", "A"),
            (2, "x x y z z z", "B"),
            (3, "y y y x q q", "C"),
        ],
        "doc_id long, text string, source string",
    )
    got = [tuple(r) for r in burrows_delta(docs, k_terms=4).collect()]
    assert got[0][:2] == ("A", "B") and got[0][2] == 0.0
    assert got[1][2] == got[2][2] > 0


def test_burrows_delta_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = [
        (
            i,
            " ".join(f"t{(i * 7 + j * (1 + i % 3)) % 9}" for j in range(8)),
            f"s{i % 4}",
        )
        for i in range(1, 41)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = sorted(tuple(r) for r in burrows_delta(docs, k_terms=6).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, source VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r) for r in con.execute(burrows_delta_sql(k_terms=6)).fetchall()
    )
    assert got == want
