"""A/B the superstep-engine execution variants (round 6).

Variants, all via env/conf so the algorithm code is identical:

- lazy vs eager localCheckpoint between checkpoints (1 vs 2 Spark jobs
  per superstep) — SPARK_GRAFT_EAGER_LC
- AQE on vs off (per-superstep driver-side re-optimization cost vs
  runtime coalescing) — SPARK_GRAFT_AQE
- preferSortMergeJoin true vs false (scatter-join strategy: SMJ re-sorts
  the cached edge table every superstep; shuffled-hash builds the small
  state side instead) — conf spark.sql.join.preferSortMergeJoin

Each run is a subprocess (own JVM, honest parallelism); interleaved
min-of-N per variant. Two scales:

    python tools/ab_superstep.py small   # corpus:50k, 12 supersteps, 32 cores
    python tools/ab_superstep.py big     # 2M-vertex graph, 3 supersteps, 8 cores

Results print as a table; nothing here feeds the frozen bench.
"""

from __future__ import annotations

import itertools
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(source: str, cores: int, steps: int, env_extra: dict) -> dict:
    env = dict(os.environ)
    env.update(env_extra)
    env["SPARK_GRAFT_PR_CHECKPOINT_EVERY"] = str(steps + 1)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--pagerank-only",
         str(cores), source, str(steps)],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "small"
    reps = int(os.environ.get("AB_REPS", "2"))
    if mode == "big":
        edir = os.environ.get("AB_EDGES_DIR")
        if not edir:
            from drone_spark.session import get_spark
            from drone_spark.corpus import generate_edges_direct

            edir = tempfile.mkdtemp(prefix="ab_superstep_") + "/edges"
            spark = get_spark("ab-gen", cores=16, shuffle_partitions=32)
            generate_edges_direct(
                spark, int(os.environ.get("AB_VERTICES", "2000000")), seed=42
            ).write.mode("overwrite").parquet(edir)
            spark.stop()
        source, cores, steps = (
            f"parquet:{edir}", int(os.environ.get("AB_CORES", "8")), 3
        )
    else:
        source, cores, steps = "corpus:50000", 32, 12

    def v(lazy, aqe, smj, step_shape, hint):
        return {
            "SPARK_GRAFT_EAGER_LC": "0" if lazy else "1",
            "SPARK_GRAFT_AQE": "1" if aqe else "0",
            "SPARK_GRAFT_PREFER_SMJ": "1" if smj else "0",
            "SPARK_GRAFT_PR_STEP": step_shape,
            "SPARK_GRAFT_SCATTER_HINT": hint,
        }

    variants: dict[str, dict] = {
        # r5 baseline behavior: eager LC, AQE on, planner SMJ, union step
        "r5base:eager-aqe-smj-union": v(0, 1, 1, "union", "none"),
        "lazy-aqe-smj-union": v(1, 1, 1, "union", "none"),
        "lazy-aqe-shj-union": v(1, 1, 0, "union", "none"),
        "lazy-noaqe-shj-union": v(1, 0, 0, "union", "none"),
        "lazy-noaqe-shj-union-hint": v(1, 0, 0, "union", "shj"),
        "lazy-noaqe-shj-jb": v(1, 0, 0, "joinback", "none"),
        "lazy-noaqe-shj-jb-hint": v(1, 0, 0, "joinback", "shj"),
        "lazy-aqe-shj-jb-hint": v(1, 1, 0, "joinback", "shj"),
    }

    only = os.environ.get("AB_ONLY")
    if only:
        keep = only.split(",")
        variants = {k: v for k, v in variants.items() if k in keep}

    best: dict[str, dict] = {}
    for rep in range(reps):
        for name, env_extra in variants.items():
            t0 = time.monotonic()
            try:
                r = run_one(source, cores, steps, env_extra)
            except Exception as exc:  # noqa: BLE001
                print(f"{name:22s} rep{rep} FAILED: {exc}")
                continue
            r["subproc_wall"] = round(time.monotonic() - t0, 1)
            if name not in best or r["iter_seconds"] < best[name]["iter_seconds"]:
                best[name] = r
            print(
                f"{name:22s} rep{rep} iter={r['iter_seconds']:.2f}s "
                f"wall={r['seconds']:.2f}s subproc={r['subproc_wall']}s"
            )
    print("\n== min-of-%d ==" % reps)
    for name, r in sorted(best.items(), key=lambda kv: kv[1]["iter_seconds"]):
        print(
            f"{name:22s} iter={r['iter_seconds']:.2f}s wall={r['seconds']:.2f}s"
            f" edges/s={r['edges_per_sec']:.0f}"
        )


if __name__ == "__main__":
    main()
