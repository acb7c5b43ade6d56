"""Interleaved A/B: HITS with dual src/dst-partitioned edge caches
(committed) vs a single src-partitioned cache whose hub pass joins on
dst — re-exchanging the full edge table every round.

Fixed 5 supersteps, same graph, one session, interleaved min-of-N.
Usage: python tools/ab_hits_cache.py [steps] [repeats] [n_vertices]
"""

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F


def hits_single_cache(spark, engine, edges, run_id, max_supersteps=5):
    """Pre-fix shape: one src-partitioned cache serves both passes."""
    from drone_spark.algorithms.hits import _l2_normalized
    from drone_spark.graph.builder import vertices

    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges_r = edges.select("src", "dst").repartition(n_parts, "src").persist()
    n_edges = edges_r.count()

    def init():
        return vertices(edges_r).select(
            F.col("id").alias("vid"), F.lit(1.0).alias("auth"),
            F.lit(1.0).alias("hub"), F.lit(1.0).alias("delta"))

    def step(state, _k):
        auth_raw = (
            state.select(F.col("vid").alias("src"), "hub")
            .join(edges_r, "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.sum("hub").alias("auth_new")))
        auth = _l2_normalized(
            state.select("vid", "auth", "hub")
            .join(auth_raw, "vid", "left")
            .withColumn("auth_new", F.coalesce("auth_new", F.lit(0.0))),
            "auth_new")
        hub_raw = (
            auth.select(F.col("vid").alias("dst"), "auth_new")
            .join(edges_r, "dst")  # <-- re-shuffles edges on dst per round
            .groupBy(F.col("src").alias("vid"))
            .agg(F.sum("auth_new").alias("hub_new")))
        out = _l2_normalized(
            auth.join(hub_raw, "vid", "left")
            .withColumn("hub_new", F.coalesce("hub_new", F.lit(0.0))),
            "hub_new")
        return out.select(
            "vid", F.col("auth_new").alias("auth"),
            F.col("hub_new").alias("hub"),
            F.greatest(F.abs(F.col("auth_new") - F.col("auth")),
                       F.abs(F.col("hub_new") - F.col("hub"))).alias("delta"))

    try:
        return engine.run(run_id, init, step, tol=0.0,
                          max_supersteps=max_supersteps,
                          edges_per_step=2 * n_edges)
    finally:
        edges_r.unpersist()


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_v = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000

    from drone_spark.algorithms.hits import hits
    from drone_spark.catalog import Catalog
    from drone_spark.corpus import generate_edges_direct
    from drone_spark.engine.superstep import SuperstepEngine
    from drone_spark.session import get_spark

    spark = get_spark("ab-hits", cores=32, shuffle_partitions=32,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    edges_dir = tempfile.mkdtemp(prefix="ab_hits_") + "/edges"
    generate_edges_direct(spark, n_v, seed=42).write.parquet(edges_dir)
    edges = spark.read.parquet(edges_dir)
    print("edges:", edges.count())
    eng = SuperstepEngine(spark, Catalog(tempfile.mkdtemp(prefix="ab_h_")),
                          num_parts=32, checkpoint_every=50)
    res = {"dual": [], "single": []}
    fixp = set()
    for rep in range(repeats):
        for mode in ("dual", "single"):
            t0 = time.monotonic()
            if mode == "dual":
                r = hits(spark, eng, edges, run_id=f"abh_d_{rep}", tol=0.0,
                         max_supersteps=steps)
            else:
                r = hits_single_cache(spark, eng, edges,
                                      run_id=f"abh_s_{rep}",
                                      max_supersteps=steps)
            dt = time.monotonic() - t0
            res[mode].append(dt)
            fixp.add(r.state.selectExpr(
                "round(sum(auth), 8)", "round(sum(hub), 8)").collect()[0])
            print(f"rep{rep} {mode}: {dt:.2f}s steps={r.supersteps}")
    assert len(fixp) == 1, fixp
    lo_d, lo_s = min(res["dual"]), min(res["single"])
    print(f"dual-cache min {lo_d:.2f}s vs single min {lo_s:.2f}s "
          f"-> {lo_s/lo_d:.2f}x (identical scores)")
    spark.stop()


if __name__ == "__main__":
    main()
