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
