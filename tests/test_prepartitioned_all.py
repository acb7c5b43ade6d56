"""Zero-edge-shuffle (`pre_partitioned`) coverage for every iterative
algorithm — VERDICT r3 item 2. One run should pay ZERO per-run edge
shuffles when fed from the bucketed catalog tables the storage layer
writes once per graph version (sources/bucketed.py): src-bucketed for
relational scatters, dst-bucketed for HITS's hub pass, vertex-cut
part-bucketed for the cogroup/subgraph backends. Each test proves the
pre-partitioned run reaches the identical result as the default path,
and the plan tests at the bottom pin the exchange structure itself."""

import pytest
from pyspark.sql import functions as F

from drone_spark.algorithms.cc import connected_components
from drone_spark.algorithms.hits import hits
from drone_spark.algorithms.kcore import core_members, k_core, symmetrize
from drone_spark.algorithms.sssp import sssp
from drone_spark.sources.bucketed import (
    read_bucketed_edges,
    write_bucketed_edges,
    write_vertexcut_edges,
)
from tests.oracles import numpy_hits, py_kcore


def _nparts(spark) -> int:
    return int(spark.conf.get("spark.sql.shuffle.partitions"))


def test_sssp_subgraph_pre_partitioned_vertexcut(
    spark, engine, small_edges, small_edges_pd, tmp_path
):
    """Subgraph (local-Dijkstra) SSSP over a vertex-cut bucketed table:
    no partitioner job, no edge shuffle, same distances as the default
    subgraph run; a table without 'part' is rejected loudly."""
    from tests.oracles import bfs_distances

    src = int(small_edges_pd["src"].iloc[0])
    n = _nparts(spark)
    write_vertexcut_edges(
        small_edges, "sssp_vc", str(tmp_path / "vc"), n_parts=n,
        salt_threshold=10,
    )
    try:
        with pytest.raises(ValueError, match="part"):
            sssp(
                spark, engine, small_edges, source=src,
                run_id="sssp_vc_guard", backend="subgraph",
                pre_partitioned=True,
            )
        res = sssp(
            spark, engine, read_bucketed_edges(spark, "sssp_vc"),
            source=src, run_id="sssp_vc_pp", backend="subgraph",
            num_parts=n, pre_partitioned=True,
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS sssp_vc")
    got = {
        r["vid"]: r["dist"] for r in res.state.collect()
        if r["dist"] != float("inf")
    }
    exp = bfs_distances(
        list(small_edges_pd.itertuples(index=False, name=None)), src
    )
    assert got == {v: float(d) for v, d in exp.items()}


def test_sssp_subgraph_pre_partitioned_weighted(spark, engine, tmp_path):
    """write_vertexcut_edges carries the weight column, so weighted
    local Dijkstra serves from the stored table too."""
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (1, 3, 5.0), (3, 4, 0.5)],
        "src long, dst long, weight double",
    )
    write_vertexcut_edges(
        edges, "sssp_vc_w", str(tmp_path / "vcw"), n_parts=2,
        salt_threshold=1000,
    )
    try:
        res = sssp(
            spark, engine, read_bucketed_edges(spark, "sssp_vc_w"),
            source=1, run_id="sssp_vc_w", backend="subgraph",
            num_parts=2, pre_partitioned=True,
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS sssp_vc_w")
    got = {
        r["vid"]: r["dist"] for r in res.state.collect()
        if r["dist"] != float("inf")
    }
    assert got == {1: 0.0, 2: 1.0, 3: 2.0, 4: 2.5}


def test_kcore_pre_partitioned_bucketed(
    spark, engine, small_edges, small_edges_pd, tmp_path
):
    """k-core over a stored symmetric src-bucketed table matches the
    Python peel; pre_partitioned without the symmetry attestation
    refuses (re-symmetrizing would re-shuffle)."""
    n = _nparts(spark)
    write_bucketed_edges(
        symmetrize(small_edges), "kcore_sym_b", str(tmp_path / "kb"),
        n_buckets=n,
    )
    try:
        with pytest.raises(ValueError, match="assume_symmetric"):
            k_core(
                spark, engine, small_edges, k=2, run_id="kc_pp_guard",
                pre_partitioned=True,
            )
        res = k_core(
            spark, engine, read_bucketed_edges(spark, "kcore_sym_b"),
            k=2, run_id="kc_pp", num_parts=n, pre_partitioned=True,
            assume_symmetric=True,
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS kcore_sym_b")
    got = {r.vid: r.deg for r in core_members(res).collect()}
    exp = py_kcore(
        list(small_edges_pd.itertuples(index=False, name=None)), 2
    )
    assert got == exp


def test_hits_pre_partitioned_dual_bucketed(
    spark, engine, small_edges, small_edges_pd, tmp_path
):
    """HITS from the two stored orientations (src- and dst-bucketed
    copies of the same edge set) matches NumPy; a single orientation
    is rejected — the hub pass would silently re-shuffle it."""
    n = _nparts(spark)
    write_bucketed_edges(
        small_edges, "hits_b_src", str(tmp_path / "hs"), n_buckets=n,
        key="src",
    )
    write_bucketed_edges(
        small_edges, "hits_b_dst", str(tmp_path / "hd"), n_buckets=n,
        key="dst",
    )
    try:
        with pytest.raises(ValueError, match="edges_dst"):
            hits(
                spark, engine, small_edges, run_id="hits_pp_guard",
                pre_partitioned=True,
            )
        res = hits(
            spark, engine, read_bucketed_edges(spark, "hits_b_src"),
            edges_dst=read_bucketed_edges(spark, "hits_b_dst"),
            run_id="hits_pp", tol=1e-7, max_supersteps=80,
            num_parts=n, pre_partitioned=True,
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS hits_b_src")
        spark.sql("DROP TABLE IF EXISTS hits_b_dst")
    got = {r.vid: (r.auth, r.hub) for r in res.state.collect()}
    exp = numpy_hits(
        list(small_edges_pd.itertuples(index=False, name=None)), tol=1e-7
    )
    assert set(got) == set(exp)
    for v, (a, h) in exp.items():
        assert abs(got[v][0] - a) < 1e-5 and abs(got[v][1] - h) < 1e-5, v


def test_cc_subgraph_pre_partitioned_vertexcut(
    spark, engine, small_edges, tmp_path
):
    """The cogroup (subgraph) CC backend accepts a vertex-cut bucketed
    table of the symmetrized edge set and reaches the same labels as
    the default subgraph run."""
    n = _nparts(spark)
    sym = symmetrize(small_edges)
    write_vertexcut_edges(
        sym, "cc_vc", str(tmp_path / "ccvc"), n_parts=n, salt_threshold=10,
    )
    try:
        pp = connected_components(
            spark, engine, read_bucketed_edges(spark, "cc_vc"),
            run_id="cc_vc_pp", backend="subgraph", num_parts=n,
            pre_partitioned=True, assume_symmetric=True,
        )
        base = connected_components(
            spark, engine, small_edges, run_id="cc_vc_base",
            backend="subgraph", num_parts=n,
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS cc_vc")
    a = {r["vid"]: r["label"] for r in base.state.collect()}
    b = {r["vid"]: r["label"] for r in pp.state.collect()}
    assert a == b


# ---------------------------------------------------------------------------
# plan pins: the exchanges themselves
# ---------------------------------------------------------------------------
def test_dst_bucketed_scan_skips_hub_pass_shuffle(
    spark, small_edges, tmp_path
):
    """HITS's hub pass joins on dst: a dst-bucketed scan must satisfy
    that distribution with no edge-side exchange (the src-side twin is
    pinned by test_plans.test_bucketed_edges_skip_edge_shuffle)."""
    import re

    n = _nparts(spark)
    write_bucketed_edges(
        small_edges, "plan_b_dst", str(tmp_path / "pbd"), n_buckets=n,
        key="dst",
    )
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        e = read_bucketed_edges(spark, "plan_b_dst")
        state = e.select(F.col("dst").alias("vid")).distinct().select(
            "vid", F.lit(1.0).alias("auth")
        )
        j = (
            state.join(e, state["vid"] == e["dst"])
            .groupBy("src").agg(F.sum("auth").alias("hub"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
        spark.sql("DROP TABLE IF EXISTS plan_b_dst")
    cols = re.findall(r"Exchange hashpartitioning\(([a-z_]+)#", plan)
    assert "dst" not in cols, plan


def test_vertexcut_bucketed_scan_feeds_cogroup_without_exchange(
    spark, small_edges, tmp_path
):
    """The cogroup backends' edge side: a part-bucketed vertex-cut scan
    (persisted, as the algorithms hold it) reaches
    FlatMapCoGroupsInPandas through a Sort only — the Exchange on
    'part' that the default path pays per run is absent."""
    import pandas as pd

    n = _nparts(spark)
    write_vertexcut_edges(
        small_edges, "plan_vc", str(tmp_path / "pvc"), n_parts=n,
        salt_threshold=10,
    )
    try:
        edges_p = read_bucketed_edges(spark, "plan_vc").persist()
        edges_p.count()
        state = spark.range(50).select(
            F.col("id").alias("vid"),
            F.pmod(F.col("id"), F.lit(n)).cast("int").alias("rpart"),
            F.lit(1.0).alias("w"),
        )

        def kernel(key, s: pd.DataFrame, e: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"dst": e["dst"].head(1), "partial": [1.0]})

        out = (
            state.groupBy("rpart")
            .cogroup(edges_p.groupBy("part"))
            .applyInPandas(kernel, schema="dst long, partial double")
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # exactly one exchange: the state side (rpart). The edge branch
        # goes scan/InMemoryRelation → Sort → cogroup.
        import re

        cols = re.findall(r"Exchange hashpartitioning\(([a-z_]+)#", plan)
        assert cols.count("part") == 0, plan
        assert "rpart" in cols, plan
        edges_p.unpersist()
    finally:
        spark.sql("DROP TABLE IF EXISTS plan_vc")
