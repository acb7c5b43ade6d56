"""Interleaved A/B: executor-side structural cache on vs off.

Cache off = use_kernel_cache=False (rebuild per superstep, the
pre-cache behavior) — a real algorithm parameter, since monkeypatching
the driver module cannot reach the Python worker processes that run the
kernels. Interleaved min-of-N in one session per the shared-VM
protocol. Usage: python tools/ab_kernel_cache.py [repeats]
"""

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from drone_spark.algorithms.cc import connected_components
    from drone_spark.algorithms.pagerank import pagerank_cogroup
    from drone_spark.catalog import Catalog
    from drone_spark.corpus import generate_pages
    from drone_spark.engine.superstep import SuperstepEngine
    from drone_spark.extraction import edges_from_pages
    from drone_spark.session import get_spark
    from __spark_entry__ import _copurchase_edges

    spark = get_spark("ab-cache", cores=32, shuffle_partitions=32)
    pages = generate_pages(spark, int(os.environ.get("AB_PAGES", "50000")), seed=42)
    edges = edges_from_pages(pages).select("src", "dst").persist()
    print("corpus edges:", edges.count())
    cop = _copurchase_edges(spark, os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")).persist()
    print("copurchase edges:", cop.count())
    eng = SuperstepEngine(
        spark, Catalog(tempfile.mkdtemp(prefix="ab_cache_")), num_parts=32,
        checkpoint_every=8,
    )
    res: dict[str, dict[str, list[float]]] = {
        "prcg": {"on": [], "off": []}, "cc": {"on": [], "off": []}}
    sums: dict[str, set] = {"prcg": set(), "cc": set()}
    for rep in range(repeats):
        for mode, use in (("on", True), ("off", False)):
            t0 = time.monotonic()
            r = pagerank_cogroup(
                spark, eng, edges, run_id=f"abq_{mode}_{rep}", tol=1e-6,
                use_kernel_cache=use)
            dt = time.monotonic() - t0
            res["prcg"][mode].append(dt)
            chk = r.state.selectExpr("round(sum(pr), 6)").collect()[0][0]
            sums["prcg"].add(chk)
            print(f"rep{rep} prcg cache={mode}: {dt:.2f}s steps={r.supersteps}")

            t0 = time.monotonic()
            r = connected_components(
                spark, eng, cop, run_id=f"abc_{mode}_{rep}", backend="subgraph",
                use_kernel_cache=use)
            dt = time.monotonic() - t0
            res["cc"][mode].append(dt)
            sums["cc"].add(r.state.selectExpr("sum(label)").collect()[0][0])
            print(f"rep{rep} cc   cache={mode}: {dt:.2f}s steps={r.supersteps}")
    assert len(sums["prcg"]) == 1 and len(sums["cc"]) == 1, sums
    for q in ("prcg", "cc"):
        on, off = min(res[q]["on"]), min(res[q]["off"])
        print(f"{q}: cache-on min {on:.2f}s vs cache-off min {off:.2f}s "
              f"-> {off/on:.2f}x (results identical)")
    spark.stop()


if __name__ == "__main__":
    main()
