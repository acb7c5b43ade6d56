"""Interleaved A/B: r2 dict union-find CC kernel vs r3 numpy kernel.

Shared-VM protocol (BASELINE.md): same session, interleaved
new,old,new,old..., min-of-N per variant. Usage:
    python tools/ab_cc_kernel.py [repeats]
"""

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd


def _old_kernel(key, seeds: pd.DataFrame, edges: pd.DataFrame) -> pd.DataFrame:
    """The r2 interpreted per-edge union-find kernel (verbatim)."""
    if seeds.empty:
        return pd.DataFrame({"vid": pd.Series(dtype="int64"),
                             "label": pd.Series(dtype="int64")})
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    srcs = edges["src"].to_numpy()
    dsts = edges["dst"].to_numpy()
    for s, d in zip(srcs, dsts):
        union(int(s), int(d))
    best: dict[int, int] = {}
    for v, lab in zip(seeds["vid"].to_numpy(), seeds["label"].to_numpy()):
        r = find(int(v))
        lab = int(lab)
        if r not in best or lab < best[r]:
            best[r] = lab
    out_v, out_l = [], []
    import numpy as np

    verts = np.unique(np.concatenate([srcs, dsts, seeds["vid"].to_numpy()]))
    for v in verts:
        r = find(int(v))
        if r in best:
            out_v.append(int(v))
            out_l.append(best[r])
    return pd.DataFrame({"vid": out_v, "label": out_l})


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import drone_spark.algorithms.cc as ccmod
    from drone_spark.algorithms.cc import connected_components
    from drone_spark.catalog import Catalog
    from drone_spark.engine.superstep import SuperstepEngine
    from drone_spark.session import get_spark
    from __spark_entry__ import _copurchase_edges

    new_kernel = ccmod._seeded_fixpoint_kernel
    spark = get_spark("ab-cc-kernel", cores=32, shuffle_partitions=32)
    edges = _copurchase_edges(spark, os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")).persist()
    n = edges.count()
    print(f"copurchase edges: {n}")
    eng = SuperstepEngine(
        spark, Catalog(tempfile.mkdtemp(prefix="ab_cc_")), num_parts=32,
        checkpoint_every=8,
    )
    results: dict[str, list[float]] = {"new": [], "old": []}
    checks: dict[str, int] = {}
    for rep in range(repeats):
        for name, kern in (("new", new_kernel), ("old", _old_kernel)):
            ccmod._seeded_fixpoint_kernel = kern
            t0 = time.monotonic()
            res = connected_components(
                spark, eng, edges, run_id=f"ab_{name}_{rep}", backend="subgraph")
            dt = time.monotonic() - t0
            results[name].append(dt)
            checks[name] = res.state.selectExpr("sum(label)").collect()[0][0]
            print(f"rep{rep} {name}: {dt:.2f}s supersteps={res.supersteps}")
    ccmod._seeded_fixpoint_kernel = new_kernel
    assert checks["new"] == checks["old"], checks
    print(f"min new={min(results['new']):.2f}s  min old={min(results['old']):.2f}s  "
          f"speedup={min(results['old'])/min(results['new']):.2f}x  (labels identical)")
    spark.stop()


if __name__ == "__main__":
    main()
