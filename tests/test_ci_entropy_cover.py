"""Collective Influence, walk entropy rate, greedy max-coverage —
hand-computed oracles + DuckDB twin replays (entry keys
collective_influence / walk_entropy_rate / greedy_cover)."""

import math

import pytest

from drone_spark.algorithms.linkstats import (
    collective_influence,
    collective_influence_sql,
    walk_entropy_rate,
    walk_entropy_rate_sql,
)
from drone_spark.ops.corpusstats import greedy_cover, greedy_cover_sql

KITE = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5)]


def test_ci_kite_hand(spark):
    """Kite + pendant, deg = (2,3,3,3,1). Distance-2 boundaries:
    ∂(1)={4}, ∂(2)=∂(3)={5}, ∂(4)={1}, ∂(5)={2,3}. CI₂ =
    (deg−1)·Σ(deg_u−1): v1 → 1·2=2, v2/v3 → 2·0=0, v4 → 2·1=2,
    v5 → 0."""
    e = spark.createDataFrame(KITE, "src long, dst long")
    got = [tuple(r) for r in collective_influence(e).collect()]
    assert got == [(1, 2, 2), (4, 3, 2), (2, 3, 0), (3, 3, 0), (5, 1, 0)]


def test_ci_hub_cap_skips_middles(spark):
    """max_degree=2 leaves only vertices 1 and 5 as admissible middles;
    no distance-2 pair survives through them on this graph, so every
    CI collapses to 0 — the documented cap contract."""
    e = spark.createDataFrame(KITE, "src long, dst long")
    got = {r["vid"]: r["ci"] for r in collective_influence(e, max_degree=2).collect()}
    assert got == {1: 0, 2: 0, 3: 0, 4: 0, 5: 0}


def test_ci_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = KITE + [(5, 6), (6, 7), (3, 7), (7, 8)]
    e = spark.createDataFrame(rows, "src long, dst long")
    got = sorted(tuple(r) for r in collective_influence(e, k=20).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE base (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO base VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            collective_influence_sql(
                "edges AS (SELECT src, dst FROM base)", k=20
            )
        ).fetchall()
    )
    assert got == want


def test_entropy_rate_kite(spark):
    """h = Σ d·ln d / 2E = (2·ln2 + 9·ln3 + 0)/12 on the kite."""
    e = spark.createDataFrame(KITE, "src long, dst long")
    [row] = walk_entropy_rate(e).collect()
    want = round((2 * math.log(2) + 9 * math.log(3)) / 12, 6)
    assert row["n_vertices"] == 5
    assert row["n_edges"] == 6
    assert row["entropy_rate"] == pytest.approx(want)


def test_entropy_rate_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = KITE + [(5, 6), (6, 1), (2, 6)]
    e = spark.createDataFrame(rows, "src long, dst long")
    got = [tuple(r) for r in walk_entropy_rate(e).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE base (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO base VALUES (?, ?)", rows)
    want = [
        tuple(r)
        for r in con.execute(
            walk_entropy_rate_sql("edges AS (SELECT src, dst FROM base)")
        ).fetchall()
    ]
    assert got == want


def test_greedy_cover_hand(spark):
    """Sets {a,b,c}, {c,d}, {e,f,g,h}, {a,e}: greedy picks 3 (gain 4),
    1 (gain 3), 2 (gain 1 — only d is new), 4 (gain 0)."""
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "c d"), (3, "e f g h"), (4, "a e")],
        "doc_id long, text string",
    )
    got = [tuple(r) for r in greedy_cover(docs, k=4).collect()]
    assert got == [(1, 3, 4), (2, 1, 3), (3, 2, 1), (4, 4, 0)]


def test_greedy_cover_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = [
        (i, " ".join(f"t{(i * 3 + j) % 17}" for j in range(2 + i % 5)))
        for i in range(1, 15)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in greedy_cover(docs, k=5, pool=8).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(greedy_cover_sql(k=5, pool=8)).fetchall()
    )
    assert got == want


# --------------------------------------------------- truss communities
def test_truss_communities_two_k4(spark, engine):
    """4-truss of two K4s + a bridge: every K4 edge has support 2 and
    survives, the bridge (support 0) peels — two communities labeled
    by min vid; vertex 9's pendant edge peels with it."""
    from drone_spark.algorithms.trusses import truss_communities

    rows = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (5, 6), (5, 7), (5, 8), (6, 7), (6, 8), (7, 8),
        (4, 5), (8, 9),
    ]
    e = spark.createDataFrame(rows, "src long, dst long")
    got = {
        r["vid"]: r["community"]
        for r in truss_communities(spark, engine, e, k=4, run_id="t_tc").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 5, 8: 5}


def test_truss_communities_sql_twin(spark, engine):
    duckdb = pytest.importorskip("duckdb")
    from drone_spark.algorithms.trusses import (
        truss_communities,
        truss_communities_sql,
    )

    rows = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (5, 6), (5, 7), (5, 8), (6, 7), (6, 8), (7, 8),
        (4, 5), (8, 9), (2, 5), (3, 6),
    ]
    e = spark.createDataFrame(rows, "src long, dst long")
    got = sorted(
        tuple(r)
        for r in truss_communities(spark, engine, e, k=4, run_id="t_tc2").collect()
    )
    # build the same 3-round unrolled peel the entry oracle uses
    con = duckdb.connect()
    con.execute("CREATE TABLE base (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO base VALUES (?, ?)", rows)
    sup = (
        "SELECT e.u, e.v, COALESCE(t.c, 0) AS support FROM {e} e "
        "LEFT JOIN (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS c FROM ("
        "SELECT LEAST(t.x, t.y) AS u, GREATEST(t.x, t.y) AS v FROM {t} t "
        "UNION ALL SELECT LEAST(t.x, t.w), GREATEST(t.x, t.w) FROM {t} t "
        "UNION ALL SELECT LEAST(t.y, t.w), GREATEST(t.y, t.w) FROM {t} t"
        ") GROUP BY u, v) t ON t.u = e.u AND t.v = e.v"
    )
    tri = (
        "SELECT a.u AS x, a.v AS y, b.v AS w FROM {e} a "
        "JOIN {e} b ON b.u = a.u AND b.v > a.v "
        "JOIN {e} c ON c.u = a.v AND c.v = b.v"
    )
    parts = [
        "WITH e0 AS (SELECT LEAST(src, dst) AS u, GREATEST(src, dst) AS v "
        "FROM base WHERE src <> dst GROUP BY 1, 2)"
    ]
    for i in range(3):
        parts.append(f"t{i} AS MATERIALIZED ({tri.format(e=f'e{i}')})")
        parts.append(
            f"g{i} AS MATERIALIZED ({sup.format(e=f'e{i}', t=f't{i}')})"
        )
        parts.append(
            f"e{i+1} AS MATERIALIZED (SELECT u, v FROM g{i} "
            "WHERE support >= 2)"
        )
    ktruss_q = ", ".join(parts) + " SELECT u, v, CAST(0 AS BIGINT) AS support FROM e3"
    want = sorted(
        tuple(r)
        for r in con.execute(truss_communities_sql(ktruss_q)).fetchall()
    )
    assert got == want
