"""Resume-equivalence + catalog semantics (north_rule resumability)."""

from pyspark.sql import functions as F

from drone_spark.algorithms.pagerank import pagerank
from drone_spark.catalog import Catalog
from drone_spark.engine.superstep import SuperstepEngine


def test_resume_equals_uninterrupted(spark, small_edges, tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    eng = SuperstepEngine(spark, cat, num_parts=8, checkpoint_every=1)
    full = pagerank(spark, eng, small_edges, run_id="full", tol=1e-4)

    # interrupted run: stop after 3 supersteps, then resume to convergence
    part = pagerank(spark, eng, small_edges, run_id="cut", tol=1e-4, max_supersteps=3)
    assert not part.converged
    cont = pagerank(spark, eng, small_edges, run_id="cut", tol=1e-4, resume=True)
    assert cont.converged and cont.resumed_from == 3
    assert cont.supersteps == full.supersteps

    a = {r["vid"]: r["pr"] for r in full.state.collect()}
    b = {r["vid"]: r["pr"] for r in cont.state.collect()}
    assert a == b  # bit-identical, not just close


def test_resume_with_sparse_checkpoints(spark, small_edges, tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    eng = SuperstepEngine(spark, cat, num_parts=8, checkpoint_every=4)
    run = pagerank(spark, eng, small_edges, run_id="sparse", tol=1e-4)
    # final state must be committed even when convergence lands off-cycle
    persisted = cat.read(spark, "runs/sparse/state")
    assert persisted.count() == run.state.count()
    # metrics exist for every superstep even between full snapshots
    m = eng.metrics("sparse")
    assert m.select("superstep").distinct().count() == run.supersteps + 1


def test_catalog_time_travel(spark, tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    df1 = spark.range(3).select(F.col("id"))
    df2 = spark.range(10, 12).select(F.col("id"))
    v1 = cat.write_snapshot(df1, "t")
    v2 = cat.append(df2, "t")
    assert cat.read(spark, "t", version=v1).count() == 3
    assert cat.read(spark, "t", version=v2).count() == 5
    v3 = cat.write_snapshot(df2, "t")
    assert cat.read(spark, "t").count() == 2
    assert cat.versions("t") == [v1, v2, v3]
