"""Capture .explain('formatted') plans for the round's evidence files.

    python tools/capture_plans.py plans/r06 suffix [target ...]

Targets:
  pr_step / prdelta_step / prcg_step / cc_step — the REAL per-superstep
      plan: SuperstepEngine._commit is intercepted at superstep 1 and the
      step DataFrame's formatted plan is written out.
  entry:<name> — the declared query <name> from __spark_entry__
      (optionally from an alternate module file via ENTRY_PATH env, so
      "before" plans can be captured from the round-start code).

Each target writes <out_dir>/<target>_<suffix>.txt.
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def capture_step(spark, which: str, out_path: str) -> None:
    """Run the algorithm for 1 superstep, intercepting the step plan."""
    from drone_spark.algorithms.cc import connected_components
    from drone_spark.algorithms.pagerank import (
        pagerank, pagerank_cogroup, pagerank_delta,
    )
    from drone_spark.catalog import Catalog
    from drone_spark.corpus import generate_pages
    from drone_spark.engine.superstep import SuperstepEngine
    from drone_spark.extraction import edges_from_pages

    edges = edges_from_pages(generate_pages(spark, 20_000, seed=42)).select(
        "src", "dst"
    )
    eng = SuperstepEngine(
        spark, Catalog(tempfile.mkdtemp(prefix="plans_")),
        num_parts=int(spark.conf.get("spark.sql.shuffle.partitions")),
        checkpoint_every=100,
    )
    captured: list[str] = []
    orig = SuperstepEngine._commit

    def spy(self, run_id, new_state, superstep, *a, **kw):
        if superstep == 1 and not captured:
            captured.append(formatted(new_state))
        return orig(self, run_id, new_state, superstep, *a, **kw)

    SuperstepEngine._commit = spy
    try:
        if which == "pr_step":
            pagerank(spark, eng, edges, run_id="plans_pr", tol=0.0,
                     max_supersteps=1)
        elif which == "prdelta_step":
            pagerank_delta(spark, eng, edges, run_id="plans_prd", tol=0.0,
                           max_supersteps=1)
        elif which == "prcg_step":
            pagerank_cogroup(spark, eng, edges, run_id="plans_prcg", tol=0.0,
                             max_supersteps=1)
        elif which == "cc_step":
            connected_components(spark, eng, edges, run_id="plans_cc",
                                 backend="subgraph", max_supersteps=1)
        else:
            raise SystemExit(f"unknown step target {which}")
    finally:
        SuperstepEngine._commit = orig
    with open(out_path, "w") as fh:
        fh.write(captured[0])


def capture_entry(spark, name: str, out_path: str) -> None:
    entry_path = os.environ.get("ENTRY_PATH")
    if entry_path:
        import importlib.util

        spec = importlib.util.spec_from_file_location("entry_alt", entry_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    else:
        import __spark_entry__ as mod
    df = mod.queries()[name](spark, SF_DIR)
    with open(out_path, "w") as fh:
        fh.write(formatted(df))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    targets = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    from drone_spark.session import get_spark

    spark = get_spark(
        "capture-plans", cores=8, shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    for t in targets:
        if t.startswith("entry:"):
            name = t.split(":", 1)[1]
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            capture_entry(spark, name, path)
        else:
            path = os.path.join(out_dir, f"{t}_{suffix}.txt")
            capture_step(spark, t, path)
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
