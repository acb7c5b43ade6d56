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
  counts / changed counts / max delta recorded in a metrics table, plus
  wall-clock and edge-traversal throughput (the reference logs the same
  per-worker numbers through FinishRequest,
  master_service.proto:33-55).

Cost model per superstep: exactly **one Spark job** — the state
materialization. Convergence *and* the per-partition metrics ride on
that same action as ``Observation`` aggregates (the per-part rows are
conditional aggregates keyed by the vertex-hash partition), so there is
no second scan-and-aggregate job per superstep. Metric rows buffer on
the driver and are appended to the metrics table at every full
checkpoint (and at run end), keeping the metrics table consistent with
the resume points: on resume, rows beyond the resumed superstep are
truncated and the resume-point row is recomputed from the loaded state,
so a crash between the state commit and the metrics append can neither
double-count nor permanently lose the resume superstep's row.

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

_METRICS_SCHEMA = (
    "superstep int, part int, n_vertices long, n_changed long, "
    "max_delta double, seconds double, state_version int, edges_traversed long"
)


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
        self._pending_metrics: list[tuple] = []

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
        is truncated in-memory (``localCheckpoint``) and metric rows
        buffer on the driver. N=1 (default) is the strict
        snapshot-every-superstep mode; the final converged state is
        always fully committed either way.
        """
        cat, spark = self.catalog, self.spark
        state_table = self._state_table(run_id)
        resumed_from: int | None = None
        self._pending_metrics = []

        if resume and cat.exists(state_table):
            version = cat.latest_version(state_table)
            meta = cat.commit_meta(state_table, version)
            k = int(meta["superstep"])
            state = cat.read(spark, state_table)
            pending = self._resume_metrics(run_id, state, k, version, edges_per_step)
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
        self._flush_metrics(run_id)
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
    def _part_col(self):
        return F.pmod(F.xxhash64("vid"), F.lit(self.num_parts)).cast("int")

    def _observe_aggs(self) -> list:
        """Global convergence max plus per-master-partition conditional
        aggregates — all evaluated inside the state-materialization
        action, replacing the former second metrics job per superstep."""
        part = self._part_col()
        aggs = [F.max("delta").alias("max_delta")]
        for p in range(self.num_parts):
            is_p = part == p
            aggs.append(F.count(F.when(is_p, True)).alias(f"n{p}"))
            aggs.append(
                F.sum(F.when(is_p & (F.col("delta") > 0), 1).otherwise(0)).alias(f"c{p}")
            )
            aggs.append(F.max(F.when(is_p, F.col("delta"))).alias(f"d{p}"))
        return aggs

    def _buffer_metrics(
        self, row: dict, superstep: int, seconds: float, version: int,
        edges_per_step: int | None,
    ) -> None:
        for p in range(self.num_parts):
            n = row.get(f"n{p}") or 0
            if not n:
                continue
            self._pending_metrics.append(
                (
                    superstep, p, int(n), int(row.get(f"c{p}") or 0),
                    float(row.get(f"d{p}") or 0.0), seconds, version,
                    int(edges_per_step or 0),
                )
            )

    def _flush_metrics(self, run_id: str) -> None:
        if not self._pending_metrics:
            return
        df = self.spark.createDataFrame(self._pending_metrics, _METRICS_SCHEMA)
        self.catalog.append(df.coalesce(1), self._metrics_table(run_id))
        self._pending_metrics = []

    def _resume_metrics(
        self, run_id: str, state: DataFrame, k: int, version: int,
        edges_per_step: int | None,
    ) -> float:
        """Make the metrics table idempotent across resumes: drop any
        rows from supersteps beyond the resume point (a prior run may
        have buffered/flushed further than the snapshot we resume from),
        then recompute the resume superstep's per-partition row from the
        loaded state — covering a crash that landed between the state
        commit and the metrics flush. Returns the state's max delta."""
        cat, spark = self.catalog, self.spark
        mtable = self._metrics_table(run_id)
        if cat.exists(mtable):
            kept = cat.read(spark, mtable).where(F.col("superstep") < k)
            cat.write_snapshot(kept.coalesce(1), mtable, meta={"truncated_to": k})
        agg = state.agg(*self._observe_aggs()).first().asDict()
        self._buffer_metrics(agg, k, 0.0, version, edges_per_step)
        self._flush_metrics(run_id)
        return float(agg["max_delta"] or 0.0)

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

        One Spark job per superstep, no driver-side collect: the state
        materialization (parquet snapshot when ``full``, else in-memory
        ``localCheckpoint``) carries an ``Observation`` with the global
        convergence aggregate *and* the per-partition metric aggregates.
        Metric rows buffer on the driver; ``full`` commits flush them to
        the metrics table as one coalesced append."""
        from pyspark.sql import Observation

        cat, spark = self.catalog, self.spark
        state_table = self._state_table(run_id)

        obs = Observation()
        observed = new_state.observe(obs, *self._observe_aggs())
        if full:
            version = cat.write_snapshot(
                observed, state_table, meta={"superstep": superstep}
            )
            committed = cat.read(spark, state_table)
        else:
            version = -1  # not a resume point
            committed = observed.localCheckpoint(eager=True)
        row = obs.get
        max_delta = float(row["max_delta"] or 0.0)
        seconds = time.monotonic() - t0
        self._buffer_metrics(row, superstep, seconds, version, edges_per_step)
        if full:
            self._flush_metrics(run_id)
        # returning the committed scan = lineage truncation: the next
        # superstep's plan starts from parquet, not the iteration history.
        return committed, max_delta
