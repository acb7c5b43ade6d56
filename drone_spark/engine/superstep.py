"""Generic superstep driver loop with checkpointing, metrics and resume.

This is the Spark-native replacement for the reference's whole control
plane: master RPC fan-out, registration barrier, per-superstep
finish/OR-termination and message exchange
(/root/reference/src/master.go:370-413, SURVEY.md §3). One DRONE
superstep (compute → mirror→master combine → master→mirror broadcast)
becomes exactly one Spark job produced by the algorithm's ``step``
function; shuffles replace every gRPC path.

What Spark does *not* give us and this engine adds (SURVEY.md §4.3):

- **fixpoint loop** — driven here, termination on the algorithm's
  ``pending`` aggregate (the analogue of the master ORing workers'
  ``MessageToSend`` flags, master.go:267-271);
- **lineage truncation** — every superstep's state is committed to the
  catalog and *read back*, so the logical plan stays O(1) deep instead
  of growing by one join+agg per iteration (without this, iteration 50
  at 100 TB would re-derive 50 shuffles of lineage on any retry);
- **resume** — a killed run restarts from its last committed snapshot
  (north_rule); commit metadata carries the superstep number;
- **per-partition metrics** — per superstep, per master-partition row
  counts / changed counts / max delta appended to a metrics table, plus
  wall-clock and edge-traversal throughput (the reference logs the same
  per-worker numbers through FinishRequest,
  master_service.proto:33-55).

State contract: a DataFrame with a long ``vid`` column, a double
``delta`` column (per-vertex change this superstep; drives convergence
and per-partition metrics), and any algorithm columns.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import Catalog


@dataclass
class RunResult:
    run_id: str
    state: DataFrame
    supersteps: int
    converged: bool
    seconds: float
    resumed_from: int | None = None
    history: list[dict] = field(default_factory=list)


class SuperstepEngine:
    def __init__(
        self,
        spark: SparkSession,
        catalog: Catalog,
        num_parts: int = 32,
        checkpoint_every: int = 1,
    ) -> None:
        self.spark = spark
        self.catalog = catalog
        self.num_parts = num_parts
        self.checkpoint_every = checkpoint_every

    # table names ----------------------------------------------------------
    @staticmethod
    def _state_table(run_id: str) -> str:
        return f"runs/{run_id}/state"

    @staticmethod
    def _metrics_table(run_id: str) -> str:
        return f"runs/{run_id}/metrics"

    def metrics(self, run_id: str) -> DataFrame:
        return self.catalog.read(self.spark, self._metrics_table(run_id))

    # main loop -------------------------------------------------------------
    def run(
        self,
        run_id: str,
        init: Callable[[], DataFrame],
        step: Callable[[DataFrame, int], DataFrame],
        tol: float = 1e-6,
        max_supersteps: int = 200,
        resume: bool = False,
        edges_per_step: int | None = None,
    ) -> RunResult:
        """Iterate ``state = step(state, k)`` until ``max(delta) <= tol``.

        ``init`` builds superstep-0 state; both callables return plans,
        the engine materializes them via catalog commits. With
        ``resume=True`` and a prior checkpoint for ``run_id``, the loop
        continues from the last committed superstep instead of
        restarting.

        ``checkpoint_every`` (constructor): full catalog commits — the
        resume points — happen every Nth superstep; in between, lineage
        is truncated in-memory (``localCheckpoint``) and only metrics
        are persisted. N=1 (default) is the strict
        snapshot-every-superstep mode; the final converged state is
        always fully committed either way.
        """
        cat, spark = self.catalog, self.spark
        state_table = self._state_table(run_id)
        resumed_from: int | None = None

        if resume and cat.exists(state_table):
            version = cat.latest_version(state_table)
            meta = cat.commit_meta(state_table, version)
            k = int(meta["superstep"])
            state = cat.read(spark, state_table)
            pending = float(state.agg(F.max("delta")).first()[0] or 0.0)
            resumed_from = k
        else:
            cat.drop(state_table)
            cat.drop(self._metrics_table(run_id))
            k = 0
            t0 = time.monotonic()
            state, pending = self._commit(run_id, init(), k, t0, edges_per_step, full=True)

        t_start = time.monotonic()
        history: list[dict] = []
        converged = pending <= tol
        last_full = True
        while not converged and k < max_supersteps:
            k += 1
            t0 = time.monotonic()
            last_full = k % self.checkpoint_every == 0
            state, pending = self._commit(
                run_id, step(state, k), k, t0, edges_per_step, full=last_full
            )
            history.append({"superstep": k, "max_delta": pending})
            converged = pending <= tol
        if not last_full:  # converged/stopped between commits: persist final state
            cat.write_snapshot(state, state_table, meta={"superstep": k})
            state = cat.read(spark, state_table)
        return RunResult(
            run_id=run_id,
            state=state,
            supersteps=k,
            converged=converged,
            seconds=time.monotonic() - t_start,
            resumed_from=resumed_from,
            history=history,
        )

    # checkpoint + metrics ---------------------------------------------------
    def _commit(
        self,
        run_id: str,
        new_state: DataFrame,
        superstep: int,
        t0: float,
        edges_per_step: int | None,
        full: bool = True,
    ) -> tuple[DataFrame, float]:
        """Materialize one superstep exactly once and record metrics.

        Two Spark jobs per superstep, no driver-side collect:
        1. state materialization (parquet snapshot when ``full``, else
           in-memory ``localCheckpoint``) with an ``Observation``
           piggy-backed on the same action for the global convergence
           aggregate — no separate convergence job;
        2. per-partition metrics: a columnar re-scan of the committed
           state, aggregated by master partition and appended to the
           metrics table as one coalesced file."""
        from pyspark.sql import Observation

        cat, spark = self.catalog, self.spark
        state_table = self._state_table(run_id)

        obs = Observation()
        observed = new_state.observe(obs, F.max("delta").alias("max_delta"))
        if full:
            version = cat.write_snapshot(
                observed, state_table, meta={"superstep": superstep}
            )
            committed = cat.read(spark, state_table)
        else:
            version = -1  # not a resume point
            committed = observed.localCheckpoint(eager=True)
        max_delta = float(obs.get["max_delta"] or 0.0)
        seconds = time.monotonic() - t0

        per_part = (
            committed.groupBy(
                F.pmod(F.xxhash64("vid"), F.lit(self.num_parts))
                .cast("int")
                .alias("part")
            )
            .agg(
                F.count(F.lit(1)).alias("n_vertices"),
                F.max("delta").alias("max_delta"),
                F.sum((F.col("delta") > 0).cast("long")).alias("n_changed"),
            )
            .select(
                F.lit(superstep).alias("superstep"),
                "part",
                "n_vertices",
                "n_changed",
                F.coalesce("max_delta", F.lit(0.0)).alias("max_delta"),
                F.lit(seconds).alias("seconds"),
                F.lit(version).alias("state_version"),
                F.lit(int(edges_per_step or 0)).alias("edges_traversed"),
            )
            .coalesce(1)
        )
        cat.append(per_part, self._metrics_table(run_id))
        # returning the committed scan = lineage truncation: the next
        # superstep's plan starts from parquet, not the iteration history.
        return committed, max_delta
