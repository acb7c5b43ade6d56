"""Interleaved A/B for cogroup-PageRank plan variants vs the r2 shape
(groupBy(dst) pre-combine + join back, routes not pre-partitioned).

"new" is whatever drone_spark.algorithms.pagerank.pagerank_cogroup
currently is; "old" is materialized here verbatim from the r2 commit so
both variants run interleaved in ONE session (the only valid comparison
on this shared VM). Results so far (50k pages / 330k edges, 59 steps):
  - union-carrier fusion + routes repartition: 0.91x — fusion LOSES in
    the cogroup backend (kernel already map-side-combines; widening
    partial rows with null carrier columns costs more than the saved
    exchange). Reverted.
  - routes repartition(vid) alone: 0.99x — neutral here (routes is
    tiny at bench scale), kept for the at-scale argument: the routes
    exchange is paid once at prep instead of once per superstep.
Usage: python tools/ab_cogroup_fusion.py [repeats]
"""

import os
import sys
import tempfile
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd
from pyspark.sql import functions as F

from drone_spark.engine.superstep import RunResult
from drone_spark.graph.builder import out_degrees, vertices


def pagerank_cogroup_old(spark, engine, edges, run_id, tol=1e-6,
                         damping=0.85, max_supersteps=200, num_parts=None,
                         salt_threshold=1024):
    """Pre-fusion shape (verbatim plan structure from the prior commit):
    routes persisted un-repartitioned; groupBy(dst) pre-combine then a
    join back to state."""
    from drone_spark.graph.partitioner import partition_graph

    n_parts = num_parts or int(spark.conf.get("spark.sql.shuffle.partitions"))
    pg = partition_graph(edges.select("src", "dst"), n_parts, salt_threshold)
    edges_p = pg.edges.repartition(n_parts, "part").persist()
    n_edges = edges_p.count()
    routes = (
        edges_p.select(F.col("src").alias("vid"), "part").distinct()
        .toDF("vid", "rpart").persist()
    )
    routes.count()
    cache_token = f"prcg-old:{run_id}:{uuid.uuid4().hex}"

    def init():
        return (
            vertices(edges_p.select("src", "dst"))
            .join(out_degrees(edges_p.select("src", "dst")), "id", "left")
            .select(
                F.col("id").alias("vid"), F.lit(1.0).alias("pr"),
                F.coalesce("outdeg", F.lit(0)).alias("outdeg"),
                F.lit(1.0).alias("delta"),
            )
        )

    def kernel(key, states: pd.DataFrame, part_edges: pd.DataFrame) -> pd.DataFrame:
        from drone_spark.graph.csr import csr_from_pandas, part_cache_get_or_build
        import numpy as np

        if part_edges.empty or states.empty:
            return pd.DataFrame({"dst": [], "partial": []}).astype(
                {"dst": "int64", "partial": "float64"})
        csr = part_cache_get_or_build(
            (cache_token, tuple(key)), len(part_edges),
            lambda: csr_from_pandas(part_edges))
        values = np.zeros(len(csr.vids))
        idx = csr.local_index(states["vid"].to_numpy(np.int64))
        ok = idx >= 0
        values[idx[ok]] = states["w"].to_numpy(np.float64)[ok]
        sums = csr.scatter_sum(values)
        nz = sums != 0.0
        return pd.DataFrame({"dst": csr.vids[nz], "partial": sums[nz]})

    def step(state, _k):
        routed = (
            state.where(F.col("outdeg") > 0)
            .select("vid", (F.col("pr") / F.col("outdeg")).alias("w"))
            .join(routes, "vid")
        )
        contribs = (
            routed.groupBy("rpart")
            .cogroup(edges_p.groupBy("part"))
            .applyInPandas(kernel, schema="dst long, partial double")
            .groupBy("dst")
            .agg(F.sum("partial").alias("acc"))
        )
        new_pr = F.lit(1.0 - damping) + F.lit(damping) * F.coalesce("acc", F.lit(0.0))
        return state.join(contribs, state["vid"] == contribs["dst"], "left").select(
            "vid", new_pr.alias("pr"), "outdeg",
            F.abs(new_pr - F.col("pr")).alias("delta"))

    try:
        return engine.run(run_id, init, step, tol=tol,
                          max_supersteps=max_supersteps, edges_per_step=n_edges,
                          traversed_expr=F.col("outdeg"))
    finally:
        edges_p.unpersist()
        routes.unpersist()


def main():
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from drone_spark.algorithms.pagerank import pagerank_cogroup
    from drone_spark.catalog import Catalog
    from drone_spark.corpus import generate_pages
    from drone_spark.engine.superstep import SuperstepEngine
    from drone_spark.extraction import edges_from_pages
    from drone_spark.session import get_spark

    spark = get_spark("ab-fusion", cores=32, shuffle_partitions=32)
    pages = generate_pages(spark, int(os.environ.get("AB_PAGES", "50000")), seed=42)
    edges = edges_from_pages(pages).select("src", "dst").persist()
    print("edges:", edges.count())
    eng = SuperstepEngine(
        spark, Catalog(tempfile.mkdtemp(prefix="ab_fu_")), num_parts=32,
        checkpoint_every=8)
    res = {"new": [], "old": []}
    fixp = set()
    for rep in range(repeats):
        for mode in ("new", "old"):
            fn = pagerank_cogroup if mode == "new" else pagerank_cogroup_old
            t0 = time.monotonic()
            r = fn(spark, eng, edges, run_id=f"abf_{mode}_{rep}", tol=1e-6)
            dt = time.monotonic() - t0
            res[mode].append(dt)
            fixp.add(r.state.selectExpr("round(sum(pr), 4)").collect()[0][0])
            print(f"rep{rep} {mode}: {dt:.2f}s steps={r.supersteps}")
    assert len(fixp) == 1, fixp
    print(f"fused min {min(res['new']):.2f}s vs pre-fusion min {min(res['old']):.2f}s"
          f" -> {min(res['old'])/min(res['new']):.2f}x (same fixpoint)")
    spark.stop()


if __name__ == "__main__":
    main()
