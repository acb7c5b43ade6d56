"""Salted mutual-proposal matching — validity, determinism, twin."""

import pytest
def test_maximal_matching_is_a_matching(spark):
    """No vertex appears in two pairs; pairs are real edges."""
    from drone_spark.algorithms.mis import maximal_matching

    rows = [(i, i + 1) for i in range(1, 12)] + [(1, 6), (3, 9), (2, 11)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = maximal_matching(edges, rounds=6).collect()
    seen = []
    eset = {(a, b) for a, b in rows} | {(b, a) for a, b in rows}
    for r in got:
        assert (r["a"], r["b"]) in eset
        seen += [r["a"], r["b"]]
    assert len(seen) == len(set(seen))


def test_maximal_matching_triangle_single_pair(spark):
    """A triangle can only ever match one pair."""
    from drone_spark.algorithms.mis import maximal_matching

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    got = maximal_matching(edges, rounds=5).collect()
    assert len(got) == 1


def test_maximal_matching_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    from drone_spark.algorithms.mis import (
        maximal_matching, maximal_matching_sql,
    )

    rows = [(i, (i * 3 + 1) % 13) for i in range(13) if i != (i * 3 + 1) % 13]
    rows += [(2, 7), (4, 9), (1, 12)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = sorted(tuple(r) for r in maximal_matching(edges, rounds=4).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE base (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO base VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            maximal_matching_sql(
                "edges AS (SELECT src, dst FROM base)", rounds=4
            )
        ).fetchall()
    )
    assert got == want
