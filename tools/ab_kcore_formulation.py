"""Interleaved A/B: k-core frontier-decrement peeling (committed) vs
the naive per-round recount formulation (join sym against the active
set on BOTH endpoints — re-exchanges the full edge table every round).

Both run in ONE session, interleaved (the only valid comparison on
this shared VM), on the bench scaling graph. Usage:
    python tools/ab_kcore_formulation.py [k] [repeats] [n_vertices]
"""

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F


def k_core_recount(spark, engine, edges, k, run_id, max_supersteps=100):
    """r3's first (pre-fix) formulation, reconstructed verbatim."""
    from drone_spark.algorithms.kcore import symmetrize

    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sym = symmetrize(edges).repartition(n_parts, "src").persist()
    n_edges = sym.count()

    def init():
        deg = sym.groupBy(F.col("src").alias("vid")).agg(
            F.count(F.lit(1)).alias("deg"))
        return deg.select(
            "vid", F.lit(True).alias("active"), "deg",
            F.lit(1.0).alias("delta"))

    def step(state, _k):
        act_src = state.where("active").select(F.col("vid").alias("src"))
        act_dst = state.where("active").select(F.col("vid").alias("dst"))
        deg_in = (
            sym.join(act_src, "src").join(act_dst, "dst")
            .groupBy(F.col("src").alias("vid"))
            .agg(F.count(F.lit(1)).alias("deg2")))
        joined = state.join(deg_in, "vid", "left")
        new_active = F.col("active") & (F.coalesce("deg2", F.lit(0)) >= k)
        return joined.select(
            "vid", new_active.alias("active"),
            F.coalesce("deg2", F.lit(0)).alias("deg"),
            F.when(F.col("active") != new_active, 1.0).otherwise(0.0)
            .alias("delta"))

    try:
        return engine.run(run_id, init, step, tol=0.0,
                          max_supersteps=max_supersteps,
                          edges_per_step=n_edges)
    finally:
        sym.unpersist()


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_v = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000

    from drone_spark.algorithms.kcore import k_core
    from drone_spark.catalog import Catalog
    from drone_spark.corpus import generate_edges_direct
    from drone_spark.engine.superstep import SuperstepEngine
    from drone_spark.session import get_spark

    spark = get_spark("ab-kcore", cores=32, shuffle_partitions=32,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    edges_dir = tempfile.mkdtemp(prefix="ab_kcore_") + "/edges"
    generate_edges_direct(spark, n_v, seed=42).write.parquet(edges_dir)
    edges = spark.read.parquet(edges_dir)
    print("edges:", edges.count())
    eng = SuperstepEngine(spark, Catalog(tempfile.mkdtemp(prefix="ab_kc_")),
                          num_parts=32, checkpoint_every=50)
    res = {"decrement": [], "recount": []}
    survivors = set()
    steps = {}
    for rep in range(repeats):
        for mode in ("decrement", "recount"):
            fn = k_core if mode == "decrement" else k_core_recount
            t0 = time.monotonic()
            r = fn(spark, eng, edges, k, run_id=f"abk_{mode}_{rep}")
            dt = time.monotonic() - t0
            res[mode].append(dt)
            n = r.state.where("active").count()
            survivors.add(n)
            steps[mode] = r.supersteps
            print(f"rep{rep} {mode}: {dt:.2f}s rounds={r.supersteps} "
                  f"core={n}")
    assert len(survivors) == 1, survivors
    lo_d, lo_r = min(res["decrement"]), min(res["recount"])
    print(f"decrement min {lo_d:.2f}s vs recount min {lo_r:.2f}s "
          f"-> {lo_r/lo_d:.2f}x speedup (same {survivors.pop()}-vertex core, "
          f"rounds d={steps['decrement']} r={steps['recount']})")
    spark.stop()


if __name__ == "__main__":
    main()
