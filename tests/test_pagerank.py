"""PageRank vs NumPy power-iteration oracle — allclose(1e-6)."""

import numpy as np

from drone_spark.algorithms.pagerank import pagerank
from tests.oracles import numpy_pagerank


def test_pagerank_matches_numpy_1e6(spark, engine, small_edges, small_edges_pd):
    res = pagerank(spark, engine, small_edges, run_id="pr_t", tol=1e-6)
    assert res.converged
    got = {r["vid"]: r["pr"] for r in res.state.collect()}
    exp = numpy_pagerank(list(small_edges_pd.itertuples(index=False, name=None)))
    assert set(got) == set(exp)
    diffs = np.array([abs(got[v] - exp[v]) for v in exp])
    assert diffs.max() < 1e-5  # both converged to 1e-6 fixpoint tolerance


def test_pagerank_delta_matches_numpy(spark, engine, small_edges, small_edges_pd):
    from drone_spark.algorithms.pagerank import pagerank_delta

    res = pagerank_delta(spark, engine, small_edges, run_id="prd_t", tol=1e-6)
    assert res.converged
    got = {r["vid"]: r["pr"] for r in res.state.collect()}
    exp = numpy_pagerank(list(small_edges_pd.itertuples(index=False, name=None)))
    diffs = np.array([abs(got[v] - exp[v]) for v in exp])
    assert diffs.max() < 1e-5


def test_pagerank_dangling_and_source_vertices(spark, engine):
    # chain with a dangling sink and a pure source: 1 -> 2 -> 3
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    res = pagerank(spark, engine, edges, run_id="pr_chain", tol=1e-9)
    got = {r["vid"]: r["pr"] for r in res.state.collect()}
    assert abs(got[1] - 0.15) < 1e-8          # no in-links
    assert abs(got[2] - (0.15 + 0.85 * 0.15)) < 1e-8
    assert abs(got[3] - (0.15 + 0.85 * (0.15 + 0.85 * 0.15))) < 1e-8


def test_metrics_recorded_per_partition(spark, engine, small_edges):
    res = pagerank(spark, engine, small_edges, run_id="pr_m", tol=1e-3)
    m = engine.metrics("pr_m").toPandas()
    assert res.supersteps > 0
    assert set(m["superstep"]) == set(range(res.supersteps + 1))
    assert (m["n_vertices"] > 0).all()
    # convergence trace is monotone-ish and ends below tol
    final = m[m.superstep == res.supersteps]["max_delta"].max()
    assert final <= 1e-3


def test_pagerank_isolated_vertices_get_teleport_mass(spark, engine):
    # SURVEY §2.1 S4: vertices = edges ∪ isolated (pages with no links).
    # Isolated vertices receive exactly the teleport mass 1-α = 0.15.
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    isolated = spark.createDataFrame([(7,), (8,)], "id long")
    res = pagerank(
        spark, engine, edges, run_id="pr_iso", tol=1e-9, extra_vertices=isolated
    )
    got = {r["vid"]: r["pr"] for r in res.state.collect()}
    assert set(got) == {1, 2, 7, 8}
    assert abs(got[7] - 0.15) < 1e-9 and abs(got[8] - 0.15) < 1e-9


def test_pagerank_delta_residual_carry_on_adversarial_chain(spark, engine):
    # long chain + heavy fan-in: sub-threshold residuals repeatedly
    # arrive at the chain head; without residual carry the truncated
    # mass accumulates past tol (ADVICE r1). 60-link chain into a hub.
    from drone_spark.algorithms.pagerank import pagerank_delta

    chain = [(i, i + 1) for i in range(60)]
    fan = [(100 + j, 0) for j in range(30)]  # 30 sources feed the head
    edges = spark.createDataFrame(chain + fan, "src long, dst long")
    res = pagerank_delta(spark, engine, edges, run_id="prd_chain", tol=1e-6)
    assert res.converged
    got = {r["vid"]: r["pr"] for r in res.state.collect()}
    exp = numpy_pagerank(chain + fan)
    diffs = np.array([abs(got[v] - exp[v]) for v in exp])
    assert diffs.max() < 1e-5


def test_pagerank_bucketed_pre_partitioned_matches(
    spark, engine, small_edges, small_edges_pd, tmp_path
):
    """PageRank over a bucketed catalog edge table with
    pre_partitioned=True (no per-run edge shuffle — the 100 TB path,
    sources/bucketed.py) must produce the same fixpoint as the
    repartition path."""
    from drone_spark.sources.bucketed import (
        read_bucketed_edges, write_bucketed_edges,
    )
    from tests.oracles import numpy_pagerank

    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    write_bucketed_edges(
        small_edges, "pr_edges_bucketed", str(tmp_path / "eb"), n_buckets=n
    )
    try:
        res = pagerank(
            spark, engine, read_bucketed_edges(spark, "pr_edges_bucketed"),
            run_id="pr_bucketed", tol=1e-6, pre_partitioned=True,
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS pr_edges_bucketed")
    assert res.converged
    got = {r["vid"]: r["pr"] for r in res.state.collect()}
    exp = numpy_pagerank(list(small_edges_pd.itertuples(index=False, name=None)))
    assert set(got) == set(exp)
    diffs = np.array([abs(got[v] - exp[v]) for v in exp])
    assert diffs.max() < 1e-5


def test_pagerank_warm_start_same_fixpoint_fewer_supersteps(
    spark, engine, small_edges, small_edges_pd
):
    """Warm-starting from a previous converged state over an updated
    graph reaches the same fixpoint (power iteration is
    init-independent) in fewer supersteps — the cross-run IncEval
    analogue for graph updates."""
    from pyspark.sql import functions as F

    base = pagerank(spark, engine, small_edges, run_id="pr_ws_base", tol=1e-6)
    # graph delta: drop a sliver of edges and add a few new ones
    updated = small_edges.where(F.xxhash64("src", "dst") % 97 != 0).unionByName(
        spark.createDataFrame([(1, 3), (3, 1), (2, 9)], "src long, dst long")
    )
    cold = pagerank(spark, engine, updated, run_id="pr_ws_cold", tol=1e-6)
    warm = pagerank(
        spark, engine, updated, run_id="pr_ws_warm", tol=1e-6,
        warm_start=base.state,
    )
    got_c = {r["vid"]: r["pr"] for r in cold.state.collect()}
    got_w = {r["vid"]: r["pr"] for r in warm.state.collect()}
    assert set(got_c) == set(got_w)
    import numpy as np

    diffs = np.array([abs(got_c[v] - got_w[v]) for v in got_c])
    assert diffs.max() < 2e-6  # same 1e-6 fixpoint from both inits
    # <= not <: on a small graph both runs can hit the same superstep
    # count; the material claim is "never worse, same fixpoint" (the
    # observed saving here is ~10 supersteps)
    assert warm.supersteps <= cold.supersteps


def test_personalized_pagerank_matches_numpy(
    spark, engine, small_edges, small_edges_pd
):
    """PPR to 1e-9 == NumPy oracle; non-seed teleport mass is zero."""
    from pyspark.sql import functions as F

    from drone_spark.algorithms.pagerank import personalized_pagerank
    from tests.oracles import numpy_ppr

    edge_list = list(small_edges_pd.itertuples(index=False, name=None))
    seed_vids = sorted({s for s, _ in edge_list})[::7][:20]
    seeds = spark.createDataFrame([(v,) for v in seed_vids], "vid long")
    res = personalized_pagerank(
        spark, engine, small_edges, seeds, run_id="t_ppr", tol=1e-9
    )
    got = {r.vid: r.pr for r in res.state.collect()}
    exp = numpy_ppr(edge_list, seed_vids, tol=1e-9)
    assert set(got) == set(exp)
    assert all(abs(got[v] - exp[v]) < 1e-7 for v in exp)
    # mass conservation sanity: Σpr ≤ 1 (dangling leak), > 0.1
    total = sum(got.values())
    assert 0.1 < total <= 1.0 + 1e-9


def test_personalized_pagerank_empty_seeds_raises(spark, engine, small_edges):
    import pytest as _pytest

    from drone_spark.algorithms.pagerank import personalized_pagerank

    with _pytest.raises(ValueError):
        personalized_pagerank(
            spark, engine, small_edges,
            spark.createDataFrame([], "vid long"), run_id="t_ppr_empty",
        )


def test_weighted_pagerank_matches_numpy(spark, engine):
    """Weighted PR == NumPy oracle on a graph with strong weight skew;
    all-ones weights reduce to the uniform kernel."""
    import random

    from drone_spark.algorithms.pagerank import pagerank, pagerank_weighted
    from tests.oracles import numpy_pagerank, numpy_weighted_pagerank

    rng = random.Random(7)
    wedges = sorted(
        {(rng.randrange(60), rng.randrange(60)) for _ in range(400)}
    )
    wedges = [(s, d, float(rng.choice([1, 1, 2, 10, 100]))) for s, d in wedges
              if s != d]
    df = spark.createDataFrame(wedges, "src long, dst long, weight double")
    res = pagerank_weighted(spark, engine, df, run_id="t_wpr", tol=1e-8)
    got = {r.vid: r.pr for r in res.state.collect()}
    exp = numpy_weighted_pagerank(wedges, tol=1e-8)
    assert set(got) == set(exp)
    assert all(abs(got[v] - exp[v]) < 1e-6 for v in exp)

    ones = df.withColumn("weight", df.weight * 0 + 1.0)
    res1 = pagerank_weighted(spark, engine, ones, run_id="t_wpr1", tol=1e-8)
    got1 = {r.vid: r.pr for r in res1.state.collect()}
    exp1 = numpy_pagerank([(s, d) for s, d, _ in wedges], tol=1e-8)
    assert all(abs(got1[v] - exp1[v]) < 1e-6 for v in exp1)
