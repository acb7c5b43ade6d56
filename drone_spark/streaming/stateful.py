"""Custom stateful streaming operator: sessionization via
``applyInPandasWithState`` — the arbitrary-stateful-processing API the
built-in ``session_window`` cannot generalize beyond (windows.py's
``sessionize_stream`` is the built-in twin; this module exists for the
session shapes that need custom state: per-session aggregates beyond
sums, inline anomaly flags, capped sessions, etc.).

Correctness under out-of-order input: events may arrive across
microbatches in any order within the watermark horizon, so the state
is a *buffer* of (event-time, value) pairs per user, and a session is
emitted only once the watermark proves it closed — every event that
could still extend it (ts ≤ last + gap) would now be later than the
watermark and hence dropped. This is the standard
buffer-until-watermark pattern; state size is bounded by the watermark
horizon per user, exactly like ``session_window``'s internal state.

Emission timing: sessions close either because newer in-buffer events
exceed the gap (emitted next invocation) or via an event-time timeout
set at (last event + gap), which fires when the watermark passes it —
so idle users flush without needing new input.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, n_events long,"
    " sum_value_c long, duration_s long"
)
_STATE_SCHEMA = "uss array<long>, cents array<long>"


def sessionize_stateful(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    value_col: str = "value",
) -> DataFrame:
    """Streaming sessionization with custom state. Output rows match
    batch :func:`..streaming.windows.sessionize` exactly for every
    session the final watermark has closed (pinned by the parity test);
    still-open sessions stay in state awaiting their timeout."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        uss: list[int] = []
        cents: list[int] = []
        if state.exists:
            s_uss, s_cents = state.get
            uss.extend(s_uss)
            cents.extend(s_cents)
        if not state.hasTimedOut:
            for pdf in pdfs:
                ts_us = (
                    pdf["ts"].values.astype("datetime64[us]").astype("int64")
                )
                uss.extend(int(t) for t in ts_us)
                cents.extend(int(x) for x in pdf["_value_c"])
        # watermark in event-time microseconds (0 on the first batch)
        wm_us = state.getCurrentWatermarkMs() * 1000

        order = sorted(range(len(uss)), key=lambda i: uss[i])
        uss = [uss[i] for i in order]
        cents = [cents[i] for i in order]

        out: list[dict[str, Any]] = []
        keep_from = 0
        i = 0
        while i < len(uss):
            # span one session: [i, j)
            j = i + 1
            while j < len(uss) and uss[j] - uss[j - 1] <= gap_us:
                j += 1
            last = uss[j - 1]
            if last + gap_us < wm_us:
                # closed: no admissible event (ts ≥ wm) can extend it
                out.append(
                    {
                        "user_id": user_id,
                        "session_start": pd.Timestamp(uss[i], unit="us"),
                        "n_events": j - i,
                        "sum_value_c": sum(cents[i:j]),
                        "duration_s": (last - uss[i]) // 1_000_000,
                    }
                )
                keep_from = j
            else:
                break  # later sessions are even newer — all kept
            i = j

        uss = uss[keep_from:]
        cents = cents[keep_from:]
        if uss:
            state.update((uss, cents))
            # flush when the watermark passes the close of the OLDEST
            # pending session — anchoring on the newest would let a
            # perpetually-active user strand earlier closed sessions
            j = 1
            while j < len(uss) and uss[j] - uss[j - 1] <= gap_us:
                j += 1
            state.setTimeoutTimestamp((uss[j - 1] + gap_us) // 1000 + 1)
        else:
            state.remove()
        yield pd.DataFrame(
            out,
            columns=[
                "user_id", "session_start", "n_events", "sum_value_c",
                "duration_s",
            ],
        ) if out else pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "session_start": pd.Series(dtype="datetime64[ns]"),
                "n_events": pd.Series(dtype="int64"),
                "sum_value_c": pd.Series(dtype="int64"),
                "duration_s": pd.Series(dtype="int64"),
            }
        )

    # integer cents computed JVM-side BEFORE the state boundary, through
    # the same decimal(18,2) HALF_UP cast as batch sessionize
    # (windows.py) — a float multiply + pandas .round() in the kernel
    # banker-rounds binary floats (1.115 → 111, batch says 112) and
    # breaks the 'matches batch exactly' contract (ADVICE r3 #1)
    with_cents = events.withColumn(
        "_value_c",
        (F.col(value_col).cast("decimal(18,2)") * 100).cast("long"),
    )
    return (
        with_cents.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def closed_by(batch_sessions: DataFrame, final_watermark_us: int,
              gap_minutes: int = 30) -> DataFrame:
    """The subset of batch :func:`sessionize` output the streaming
    operator must have emitted once the watermark reached
    ``final_watermark_us``: sessions whose last event + gap is older
    than the watermark. Used by the parity test and by backfill
    reconciliation."""
    gap_us = gap_minutes * 60 * 1_000_000
    end_us = F.unix_micros(
        F.col("session_start").cast("timestamp")
    ) + F.col("duration_s") * 1_000_000
    return batch_sessions.where(end_us + gap_us < F.lit(final_watermark_us))
