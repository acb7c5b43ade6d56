"""Cogrouped-CSR PageRank backend ≡ relational backend (north_star shape)."""

from drone_spark.algorithms.pagerank import pagerank, pagerank_cogroup


def test_cogroup_matches_relational(spark, engine, small_edges):
    rel = pagerank(spark, engine, small_edges, run_id="prc_rel", tol=1e-4)
    cg = pagerank_cogroup(
        spark, engine, small_edges, run_id="prc_cg", tol=1e-4,
        num_parts=4, salt_threshold=10,  # force salted-hub path
    )
    assert rel.converged and cg.converged
    a = {r["vid"]: r["pr"] for r in rel.state.collect()}
    b = {r["vid"]: r["pr"] for r in cg.state.collect()}
    assert set(a) == set(b)
    assert max(abs(a[v] - b[v]) for v in a) < 1e-4 * 2


def test_csr_scatter():
    import numpy as np
    from drone_spark.graph.csr import LocalCSR

    # 1->2, 1->3, 2->3
    csr = LocalCSR.from_edges(
        np.array([1, 1, 2], dtype=np.int64), np.array([2, 3, 3], dtype=np.int64)
    )
    assert list(csr.vids) == [1, 2, 3]
    vals = np.array([1.0, 10.0, 100.0])
    out = csr.scatter_sum(vals)
    assert list(out) == [0.0, 1.0, 11.0]
    idx = csr.local_index(np.array([3, 99], dtype=np.int64))
    assert list(idx) == [2, -1]
