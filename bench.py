"""Benchmark harness — one JSON line to stdout.

Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]:

- pagerank_1e6   : the BASELINE.json metric query — PageRank to 1e-6
                   convergence (damping 0.85) on the bipartite
                   order→part link graph, per-superstep checkpoints on.
- cc / lp        : subgraph-centric local-fixpoint labeling on the
                   co-purchase graph.
- triangles      : degree-ordered intersection count.
- extract_edges  : pages→HTML→links extraction path (north_star
                   upstream stage) on a generated 20k-page corpus.
- minhash_dedup / cosine_topk : corpus-pipeline ops.

Extra top-level keys report the north-rule numbers: supersteps,
edges/sec, supersteps/hour for the PageRank run, plus (unless
SPARK_GRAFT_SKIP_SCALING=1) a two-parallelism-level scaling probe of
the same PageRank job via subprocesses (local[N/4] vs local[N]) —
the sandbox proxy for the N→4N executor scaling-efficiency criterion.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _pagerank_job(sf_dir: str, cores: int) -> dict:
    """Self-contained PageRank-to-1e-6 run; returns timing facts.

    Importable by the scaling subprocess (python bench.py --pagerank-only N).
    """
    from drone_spark.catalog import Catalog
    from drone_spark.engine.superstep import SuperstepEngine
    from drone_spark.session import get_spark
    from drone_spark.algorithms.pagerank import pagerank
    from __spark_entry__ import _bipartite_edges

    spark = get_spark(f"bench-pr-{cores}", cores=cores, shuffle_partitions=cores)
    edges = _bipartite_edges(spark, sf_dir)
    n_edges = edges.count()
    eng = SuperstepEngine(
        spark, Catalog(tempfile.mkdtemp(prefix="bench_pr_")), num_parts=cores,
        checkpoint_every=1,
    )
    t0 = time.monotonic()
    res = pagerank(spark, eng, edges, run_id="bench_pr", tol=1e-6)
    wall = time.monotonic() - t0
    spark.stop()
    return {
        "seconds": wall,
        "supersteps": res.supersteps,
        "converged": res.converged,
        "n_edges": n_edges,
        "edges_per_sec": n_edges * res.supersteps / wall,
        "supersteps_per_hour": res.supersteps / wall * 3600,
    }


def main() -> None:
    from drone_spark.catalog import Catalog
    from drone_spark.engine.superstep import SuperstepEngine
    from drone_spark.session import get_spark
    from drone_spark.algorithms.cc import connected_components, label_propagation
    from drone_spark.algorithms.triangles import triangle_count
    from drone_spark.corpus import generate_pages
    from drone_spark.extraction import edges_from_pages
    from drone_spark.ops.dedup import minhash_lsh_pairs
    from drone_spark.ops.similarity import cosine_topk_bruteforce
    from pyspark.sql import functions as F
    from __spark_entry__ import _copurchase_edges

    timings: dict[str, float] = {}
    extras: dict[str, object] = {}

    # -- headline: PageRank to 1e-6 (own session so cores are honest)
    pr = _pagerank_job(SF_DIR, CPUS)
    timings["pagerank_1e6"] = round(pr.pop("seconds"), 2)
    extras["pagerank"] = {k: round(v, 2) if isinstance(v, float) else v for k, v in pr.items()}

    spark = get_spark("bench", cores=CPUS, shuffle_partitions=CPUS)

    def timed(name, fn):
        t0 = time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t0, 2)

    cop = _copurchase_edges(spark, SF_DIR).persist()
    cop.count()

    eng = SuperstepEngine(
        spark, Catalog(tempfile.mkdtemp(prefix="bench_")), num_parts=CPUS,
        checkpoint_every=1,
    )
    timed("cc", lambda: connected_components(
        spark, eng, cop, run_id="bench_cc", backend="subgraph"))
    timed("lp", lambda: label_propagation(
        spark, eng, cop, run_id="bench_lp", backend="subgraph"))
    timed("triangles", lambda: triangle_count(cop).collect())

    pages = generate_pages(spark, 20_000, seed=42)
    timed("extract_edges", lambda: edges_from_pages(pages).count())

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    timed("minhash_dedup", lambda: minhash_lsh_pairs(docs, threshold=0.7).count())

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = (
        emb.orderBy("vec_id").limit(8)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    timed("cosine_topk", lambda: cosine_topk_bruteforce(emb, queries, k=10).count())
    spark.stop()

    # -- scaling probe: same PageRank job at N/4 and N cores (subprocess
    # isolation so each JVM really has that parallelism)
    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        low_cores = max(CPUS // 4, 1)
        scaling_sf = os.environ.get("SPARK_GRAFT_SCALING_SF_DIR", SF_DIR)
        levels = {}
        for c in (low_cores, CPUS):
            out = subprocess.run(
                [sys.executable, __file__, "--pagerank-only", str(c), scaling_sf],
                capture_output=True, text=True, timeout=3600,
            )
            levels[c] = json.loads(out.stdout.strip().splitlines()[-1])
        thr_low = levels[low_cores]["edges_per_sec"]
        thr_high = levels[CPUS]["edges_per_sec"]
        extras["scaling"] = {
            "cores_low": low_cores,
            "cores_high": CPUS,
            "sf_dir": scaling_sf,
            "seconds_low": round(levels[low_cores]["seconds"], 2),
            "seconds_high": round(levels[CPUS]["seconds"], 2),
            "edges_per_sec_low": round(thr_low, 0),
            "edges_per_sec_high": round(thr_high, 0),
            "efficiency": round(thr_high / (thr_low * (CPUS / low_cores)), 3),
        }

    total = round(sum(timings.values()), 2)
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        **extras,
    }))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--pagerank-only":
        cores = int(sys.argv[2])
        sf = sys.argv[3] if len(sys.argv) > 3 else SF_DIR
        facts = _pagerank_job(sf, cores)
        facts["seconds"] = facts["seconds"]
        print(json.dumps(facts))
    else:
        main()
