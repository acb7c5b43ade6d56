"""SSSP vs BFS oracle (unit weights, reference graph.go:357-362)."""

from drone_spark.algorithms.sssp import reached, sssp
from tests.oracles import bfs_distances


def test_sssp_matches_bfs(spark, engine, small_edges, small_edges_pd):
    source = int(small_edges_pd["src"].iloc[0])
    res = sssp(spark, engine, small_edges, source=source, run_id="sssp_t")
    assert res.converged
    got = {r["vid"]: r["dist"] for r in reached(res.state).collect()}
    exp = bfs_distances(
        list(small_edges_pd.itertuples(index=False, name=None)), source
    )
    assert got == exp  # unreached vertices absent on both sides


def test_sssp_weighted(spark, engine):
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (1, 3, 5.0)],
        "src long, dst long, weight double",
    )
    res = sssp(spark, engine, edges, source=1, run_id="sssp_w")
    got = {r["vid"]: r["dist"] for r in reached(res.state).collect()}
    assert got == {1: 0.0, 2: 1.0, 3: 2.0}


def test_sssp_subgraph_backend_matches_bfs(spark, engine, small_edges, small_edges_pd):
    source = int(small_edges_pd["src"].iloc[0])
    res = sssp(
        spark, engine, small_edges, source=source, run_id="sssp_sub",
        backend="subgraph", num_parts=4, salt_threshold=1000,
    )
    assert res.converged
    got = {r["vid"]: r["dist"] for r in reached(res.state).collect()}
    exp = bfs_distances(
        list(small_edges_pd.itertuples(index=False, name=None)), source
    )
    assert got == exp


def test_sssp_subgraph_fewer_supersteps_on_path_graph(spark, engine):
    # path 0→1→…→19: one-hop relaxation needs ~diameter supersteps; the
    # local-Dijkstra kernel (reference SSSP.go:21-44,83-106) crosses a
    # whole partition segment per superstep.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(19)], "src long, dst long"
    )
    rel = sssp(spark, engine, edges, source=0, run_id="sssp_path_rel")
    sub = sssp(
        spark, engine, edges, source=0, run_id="sssp_path_sub",
        backend="subgraph", num_parts=4, salt_threshold=1000,
    )
    exp = {i: float(i) for i in range(20)}
    assert {r["vid"]: r["dist"] for r in reached(rel.state).collect()} == exp
    assert {r["vid"]: r["dist"] for r in reached(sub.state).collect()} == exp
    assert sub.supersteps < rel.supersteps


def test_sssp_subgraph_weighted(spark, engine):
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (1, 3, 5.0)],
        "src long, dst long, weight double",
    )
    res = sssp(
        spark, engine, edges, source=1, run_id="sssp_w_sub",
        backend="subgraph", num_parts=2, salt_threshold=1000,
    )
    got = {r["vid"]: r["dist"] for r in reached(res.state).collect()}
    assert got == {1: 0.0, 2: 1.0, 3: 2.0}


def test_sssp_pre_partitioned_bucketed(spark, engine, small_edges, small_edges_pd, tmp_path):
    """SSSP over a bucketed edge table (pre_partitioned=True) matches
    the BFS oracle exactly."""
    from drone_spark.algorithms.sssp import sssp
    from drone_spark.sources.bucketed import (
        read_bucketed_edges, write_bucketed_edges,
    )
    from tests.oracles import bfs_distances

    src = int(small_edges_pd["src"].iloc[0])
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    write_bucketed_edges(
        small_edges, "sssp_edges_b", str(tmp_path / "eb"), n_buckets=n
    )
    try:
        res = sssp(
            spark, engine, read_bucketed_edges(spark, "sssp_edges_b"),
            source=src, run_id="sssp_pp", pre_partitioned=True,
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS sssp_edges_b")
    got = {r["vid"]: r["dist"] for r in res.state.collect()}
    exp = bfs_distances(
        list(small_edges_pd.itertuples(index=False, name=None)), src
    )
    reached = {v: d for v, d in got.items() if d != float("inf")}
    assert reached == {v: float(d) for v, d in exp.items()}
