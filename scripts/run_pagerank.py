"""spark-submit entrypoint: PageRank over a link-graph edge table.

Usage (local sandbox; on a cluster change --master and add executors):

    cd /root/repo && zip -qr /tmp/drone_spark.zip drone_spark
    spark-submit --master local[16] --py-files /tmp/drone_spark.zip \
        scripts/run_pagerank.py \
        --edges /path/to/edges_parquet --out /tmp/pr_out \
        --tol 1e-6 --variant delta

    # or extract the graph from a pages table first:
    spark-submit ... scripts/run_pagerank.py \
        --pages /path/to/pages_parquet --out /tmp/pr_out

Writes the converged (vid, pr) table to --out and prints one JSON line
of run facts (supersteps, seconds, edges/sec). Resume: pass --resume
with the same --checkpoint-dir and --run-id after an interrupted run.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile


def main() -> None:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--edges", help="parquet dir with (src,dst)")
    src.add_argument("--edges-table", help="bucketed catalog table name "
                     "(sources/bucketed.py) — runs pre_partitioned, no edge shuffle")
    src.add_argument("--pages", help="parquet dir with the pages table")
    ap.add_argument("--warm-start", default=None,
                    help="parquet dir with a previous run's (vid, pr) — seed the "
                    "iteration for few-superstep re-rank after a graph delta "
                    "(requires --variant full)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--variant", choices=["full", "delta", "cogroup"], default="delta")
    ap.add_argument("--max-supersteps", type=int, default=200)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--run-id", default="pagerank")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--checkpoint-every", type=int, default=1)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # under spark-submit the session/master comes from the submit args;
    # getOrCreate() attaches to it
    spark = SparkSession.builder.appName("drone-pagerank").getOrCreate()

    from drone_spark.catalog import Catalog
    from drone_spark.engine.superstep import SuperstepEngine
    # NB: drone_spark.algorithms re-exports the pagerank *function*,
    # shadowing the submodule attribute — import the functions directly
    from drone_spark.algorithms.pagerank import (
        pagerank, pagerank_cogroup, pagerank_delta,
    )

    pre_partitioned = False
    if args.edges:
        edges = spark.read.parquet(args.edges)
    elif args.edges_table:
        from drone_spark.sources.bucketed import read_bucketed_edges

        edges = read_bucketed_edges(spark, args.edges_table)
        pre_partitioned = True
    else:
        from drone_spark.extraction import edges_from_pages

        edges = edges_from_pages(spark.read.parquet(args.pages)).select("src", "dst")

    ckpt = args.checkpoint_dir or tempfile.mkdtemp(prefix="drone_pr_ckpt_")
    engine = SuperstepEngine(
        spark,
        Catalog(ckpt),
        num_parts=spark.sparkContext.defaultParallelism,
        checkpoint_every=args.checkpoint_every,
    )
    fn = {
        "full": pagerank,
        "delta": pagerank_delta,
        "cogroup": pagerank_cogroup,
    }[args.variant]
    kwargs = {}
    if args.variant in ("full", "delta"):
        kwargs["pre_partitioned"] = pre_partitioned
    elif pre_partitioned:
        print("note: --edges-table with cogroup re-partitions by vertex-cut part",
              file=sys.stderr)
    if args.warm_start:
        if args.variant != "full":
            ap.error("--warm-start requires --variant full")
        kwargs["warm_start"] = spark.read.parquet(args.warm_start)
    res = fn(
        spark, engine, edges, run_id=args.run_id, tol=args.tol,
        damping=args.damping, max_supersteps=args.max_supersteps,
        resume=args.resume, **kwargs,
    )
    res.state.select("vid", "pr").write.mode("overwrite").parquet(args.out)
    n_edges = edges.count()
    print(json.dumps({
        "run_id": args.run_id,
        "variant": args.variant,
        "converged": res.converged,
        "supersteps": res.supersteps,
        "iter_seconds": round(res.seconds, 2),
        "n_edges": n_edges,
        "edges_per_sec": round(n_edges * res.supersteps / max(res.seconds, 1e-9), 0),
        "checkpoint_dir": ckpt,
        "resumed_from": res.resumed_from,
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
