"""Resume-equivalence + catalog semantics (north_rule resumability)."""

import pytest
from pyspark.sql import functions as F

from drone_spark.algorithms.cc import connected_components, label_propagation
from drone_spark.algorithms.hits import hits
from drone_spark.algorithms.kcore import k_core
from drone_spark.algorithms.pagerank import (
    pagerank,
    pagerank_delta,
    pagerank_weighted,
    personalized_pagerank,
)
from drone_spark.algorithms.sssp import sssp
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


# one runner per engine-run algorithm — resume/API symmetry (VERDICT r3 #7).
# Each takes (spark, eng, edges, run_id, cut, resume) where cut is the
# max_supersteps budget of the interrupted run (None = full budget).
_ALGOS = {
    "pagerank": lambda s, e, ed, rid, ms, rs: pagerank(
        s, e, ed, run_id=rid, tol=1e-4, max_supersteps=ms or 200, resume=rs
    ),
    "pagerank_delta": lambda s, e, ed, rid, ms, rs: pagerank_delta(
        s, e, ed, run_id=rid, tol=1e-4, max_supersteps=ms or 200, resume=rs
    ),
    "pagerank_weighted": lambda s, e, ed, rid, ms, rs: pagerank_weighted(
        s,
        e,
        ed.withColumn("weight", (F.col("src") + F.col("dst")) % 5 + 1),
        run_id=rid,
        tol=1e-4,
        max_supersteps=ms or 200,
        resume=rs,
    ),
    "ppr": lambda s, e, ed, rid, ms, rs: personalized_pagerank(
        s,
        e,
        ed,
        ed.select(F.col("src").alias("vid")).orderBy("vid").limit(3),
        run_id=rid,
        tol=1e-7,
        max_supersteps=ms or 200,
        resume=rs,
    ),
    "cc": lambda s, e, ed, rid, ms, rs: connected_components(
        s, e, ed, run_id=rid, max_supersteps=ms or 100, resume=rs
    ),
    "lp": lambda s, e, ed, rid, ms, rs: label_propagation(
        s, e, ed, run_id=rid, max_supersteps=ms or 100, resume=rs
    ),
    # page ids are url hashes, so source must be a real vertex — take
    # the smallest src id (deterministic for the fixture)
    "sssp": lambda s, e, ed, rid, ms, rs: sssp(
        s,
        e,
        ed,
        source=ed.agg(F.min("src")).collect()[0][0],
        run_id=rid,
        max_supersteps=ms or 200,
        resume=rs,
    ),
    # k=6: the smallest k whose peeling takes multiple rounds on the
    # 200-page fixture (k<=5 converges in one round — nothing to resume)
    "kcore": lambda s, e, ed, rid, ms, rs: k_core(
        s, e, ed, k=6, run_id=rid, max_supersteps=ms or 100, resume=rs
    ),
    "hits": lambda s, e, ed, rid, ms, rs: hits(
        s, e, ed, run_id=rid, tol=1e-6, max_supersteps=ms or 100, resume=rs
    ),
}


@pytest.mark.parametrize("algo", sorted(_ALGOS))
def test_kill_and_resume_bit_identity_all_algorithms(
    spark, small_edges, tmp_path, algo
):
    """Interrupt every engine-run algorithm mid-run, resume from the
    checkpoint, and require the final state to be BIT-identical (every
    column of every row) to the uninterrupted run's."""
    run = _ALGOS[algo]
    cat = Catalog(str(tmp_path / "cat"))
    eng = SuperstepEngine(spark, cat, num_parts=8, checkpoint_every=1)

    full = run(spark, eng, small_edges, f"{algo}_full", None, False)
    assert full.converged

    cut = max(1, full.supersteps // 2)
    part = run(spark, eng, small_edges, f"{algo}_cut", cut, False)
    assert not part.converged  # the interruption actually interrupted
    cont = run(spark, eng, small_edges, f"{algo}_cut", None, True)
    assert cont.converged and cont.resumed_from == cut
    assert cont.supersteps == full.supersteps

    cols = sorted(full.state.columns)
    a = sorted(map(tuple, full.state.select(*cols).collect()))
    b = sorted(map(tuple, cont.state.select(*cols).collect()))
    assert a == b


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
