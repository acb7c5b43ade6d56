"""k-core peeling and HITS vs Python/NumPy oracles."""

from pyspark.sql import functions as F

from drone_spark.algorithms.hits import hits
from drone_spark.algorithms.kcore import core_members, k_core
from tests.oracles import numpy_hits, py_kcore


def test_kcore_matches_python_peel(spark, engine, small_edges, small_edges_pd):
    edge_list = list(small_edges_pd.itertuples(index=False, name=None))
    for k in (2, 3):
        res = k_core(spark, engine, small_edges, k=k, run_id=f"t_kcore{k}")
        got = {r.vid: r.deg for r in core_members(res).collect()}
        exp = py_kcore(edge_list, k)
        assert got == exp
        assert res.converged


def test_kcore_peels_chain_entirely(spark, engine):
    # a path graph has empty 2-core; a triangle survives
    rows = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10)]
    df = spark.createDataFrame(rows, "src long, dst long")
    res = k_core(spark, engine, df, k=2, run_id="t_kcore_chain")
    got = {r.vid: r.deg for r in core_members(res).collect()}
    assert got == {10: 2, 11: 2, 12: 2}


def test_hits_matches_numpy(spark, engine, small_edges, small_edges_pd):
    edge_list = list(small_edges_pd.itertuples(index=False, name=None))
    res = hits(spark, engine, small_edges, run_id="t_hits", tol=1e-7,
               max_supersteps=80)
    got = {r.vid: (r.auth, r.hub) for r in res.state.collect()}
    exp = numpy_hits(edge_list, tol=1e-7)
    assert set(got) == set(exp)
    for v, (a, h) in exp.items():
        assert abs(got[v][0] - a) < 1e-5, v
        assert abs(got[v][1] - h) < 1e-5, v


import pytest


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_kcore_random_graphs(spark, engine, seed):
    """Randomized graphs (power-law-ish via preferential ids) against
    the Python peel oracle across several k."""
    import random

    rng = random.Random(seed)
    edges = sorted(
        {
            (rng.randrange(40), rng.randrange(rng.choice([10, 40])))
            for _ in range(150)
        }
    )
    edges = [(s, d) for s, d in edges if s != d]
    df = spark.createDataFrame(edges, "src long, dst long")
    for k in (2, 4):
        res = k_core(spark, engine, df, k=k, run_id=f"t_kc_r{seed}_{k}")
        got = {r.vid: r.deg for r in core_members(res).collect()}
        assert got == py_kcore(edges, k), (seed, k)


@pytest.mark.parametrize("seed", [5, 19])
def test_hits_random_graphs(spark, engine, seed):
    import random

    rng = random.Random(seed)
    edges = sorted(
        {(rng.randrange(30), rng.randrange(30)) for _ in range(120)}
    )
    edges = [(s, d) for s, d in edges if s != d]
    df = spark.createDataFrame(edges, "src long, dst long")
    res = hits(spark, engine, df, run_id=f"t_hits_r{seed}", tol=1e-7,
               max_supersteps=80)
    got = {r.vid: (r.auth, r.hub) for r in res.state.collect()}
    exp = numpy_hits(edges, tol=1e-7)
    for v, (a, h) in exp.items():
        assert abs(got[v][0] - a) < 1e-5 and abs(got[v][1] - h) < 1e-5, (seed, v)


def test_s_core_weighted_peel_hand_computed(spark):
    """Triangle 1-2-3 with weights (1,2)=5, (1,3)=5, (2,3)=1, pendant
    (3,4)=10. Strengths: 1:10, 2:6, 3:16, 4:10. s=8: round 1 drops 2
    (6<8) → 1:5, 3:15, 4:10; round 2 drops 1 (5<8) → 3:11, 4:10;
    fixpoint {3,4} with strengths 11... wait: dropping 1 removes
    w(1,3)=5 → 3: 16−1−5=10; core {3,4} strengths 10, 10."""
    from drone_spark.algorithms.kcore import s_core

    e = spark.createDataFrame(
        [(1, 2, 5), (1, 3, 5), (2, 3, 1), (3, 4, 10)],
        "src long, dst long, w long",
    )
    out = {r["vid"]: (r["in_core"], r["strength"])
           for r in s_core(e, s=8, weight_col="w").collect()}
    assert out[2][0] is False and out[1][0] is False
    assert out[3] == (True, 10) and out[4] == (True, 10)
    # pinned rounds beyond the fixpoint change nothing
    pinned = {r["vid"]: (r["in_core"], r["strength"])
              for r in s_core(e, s=8, weight_col="w", rounds=6).collect()}
    assert {v: pinned[v] for v in (3, 4)} == {3: (True, 10), 4: (True, 10)}
    # s above every strength empties the core in one cascade
    assert s_core(e, s=100, weight_col="w").where("in_core").count() == 0


# ------------------------------------------------------ onion layers
def test_onion_layers_hand_oracle(spark):
    """Kite + tail (1-2,1-3,2-3,2-4,3-4,4-5,5-6):
    r1: k=1 removes {6}; r2: 5 drops to deg1 → {5};
    r3: k=2 removes {1,4}; r4: 2-3 alone → {2,3}."""
    from drone_spark.algorithms.kcore import onion_layers

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)],
        "src long, dst long",
    )
    got = sorted(tuple(r) for r in onion_layers(edges, rounds=16).collect())
    assert got == [(1, 3), (2, 4), (3, 4), (4, 3), (5, 2), (6, 1)]


def test_onion_layers_bounded_prefix_is_exact(spark):
    """rounds=R returns exactly the unbounded decomposition's layers
    ≤ R — the prefix never relabels."""
    from drone_spark.algorithms.kcore import onion_layers

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)],
        "src long, dst long",
    )
    got = sorted(tuple(r) for r in onion_layers(edges, rounds=2).collect())
    assert got == [(5, 2), (6, 1)]


def test_onion_layers_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    from drone_spark.algorithms.kcore import onion_layers, onion_layers_sql

    rows = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (2, 4), (4, 5),
            (5, 6), (6, 7), (7, 5), (3, 8)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = sorted(tuple(r) for r in onion_layers(edges, rounds=10).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE base (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO base VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            onion_layers_sql("edges AS (SELECT src, dst FROM base)", rounds=10)
        ).fetchall()
    )
    assert got == want


def test_s_core_pre_partitioned_matches_and_skips_shuffle(spark, tmp_path):
    """VERDICT r5 next #6: a bucketed symmetrized weighted table feeds
    s_core with zero edge exchange, and the result matches the default
    path bit-for-bit."""
    import re

    from drone_spark.algorithms.kcore import s_core
    from drone_spark.sources.bucketed import (
        read_bucketed_edges, write_bucketed_edges,
    )

    e = spark.createDataFrame(
        [(1, 2, 5), (1, 3, 5), (2, 3, 1), (3, 4, 10)],
        "src long, dst long, w long",
    )
    base = {tuple(r) for r in s_core(e, s=8, weight_col="w").collect()}

    # store the symmetrized aggregated weighted edge set bucketed on src
    und = (
        e.where("src != dst")
        .selectExpr("least(src,dst) a", "greatest(src,dst) b", "w")
        .groupBy("a", "b").sum("w")
        .selectExpr("a", "b", "`sum(w)` as w")
    )
    symw = und.selectExpr("a as src", "b as dst", "w").unionAll(
        und.selectExpr("b as src", "a as dst", "w")
    )
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    write_bucketed_edges(symw, "score_symw_test", str(tmp_path / "sw"), n)
    try:
        tbl = read_bucketed_edges(spark, "score_symw_test")
        got = {
            tuple(r)
            for r in s_core(
                tbl, s=8, weight_col="w",
                pre_partitioned=True, assume_symmetric=True,
            ).collect()
        }
        assert got == base
        # plan pin: the first peeling round's decrement join must not
        # re-exchange the bucketed edge side
        from pyspark.sql import functions as F

        prepped = tbl.persist()
        dropping = spark.createDataFrame([(2,)], "src long")
        dec = (
            prepped.join(dropping, "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.sum("w").alias("dec"))
        )
        live = dec._jdf.queryExecution().executedPlan().toString()
        for m in re.finditer(r"Exchange hashpartitioning\(([a-z_]+)#", live):
            assert m.group(1) != "src", live
        prepped.unpersist()
    finally:
        spark.sql("DROP TABLE IF EXISTS score_symw_test")
