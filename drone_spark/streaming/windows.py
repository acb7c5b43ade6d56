"""Streaming windowed aggregation + dedup over an events directory.

Batch/stream parity: each streaming op has the exact batch equivalent
used by its test — the streaming plan with an ``availableNow`` trigger
over a static directory must produce identical results.

At production scale the source is ``readStream`` on the ingestion
bucket (or Kafka); watermarks bound state so a 100 TB/day event feed
holds only the open windows in state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def _us(col) -> F.Column:
    """Integer microseconds since epoch. Events timestamps are NTZ in
    parquet; unix_micros needs TIMESTAMP, and the NTZ->LTZ cast's fixed
    session-tz shift cancels in every difference we take."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def hourly_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windows of event counts + value sums per type;
    watermark bounds late data (and state)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("hour"), "event_type", "n_events", "sum_value"
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Drop duplicate event_ids within the watermark horizon — the
    streaming analogue of exact dedup (at-least-once source → effectively
    exactly-once sink)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def sessionize(
    events: DataFrame, gap_minutes: int = 30, value_col: str = "value"
) -> DataFrame:
    """Batch sessionization (gaps-and-islands): consecutive events of a
    user belong to one session while the inter-event gap is ≤ ``gap``.

    Returns one row per (user_id, session): session_start, n_events,
    sum of ``value_col`` in integer cents (exact across engines), and
    duration_s (max ts − min ts, seconds). The reference engine has no
    session concept; this is the web-analytics op a crawl/event pipeline
    needs downstream of ingestion.

    Scale shape: the two analytic windows are PARTITION BY user_id — a
    single hash exchange on user_id that the subsequent groupBy reuses
    (one shuffle total, no driver involvement). Per-user data is tiny by
    construction, so no skew lever is needed; ties on ts are broken by
    event_id so the lag is deterministic in every engine.
    """
    # all gap/duration arithmetic in integer MICROseconds: second-level
    # functions floor in Spark but round in DuckDB's epoch-cast, so a
    # sub-second timestamp would make the two engines disagree on
    # session boundaries — exact int64 microseconds agree everywhere
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        F.col(value_col).alias("v"),
        F.when(
            F.lag("ts").over(w).isNull()
            | (_us("ts") - _us(F.lag("ts").over(w)) > gap_us),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_sess"),
    )
    sess = flagged.withColumn(
        "sid", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    cents = (F.col("v").cast("decimal(18,2)") * 100).cast("long")
    dur_s = (
        (_us(F.max("ts")) - _us(F.min("ts")))
        / F.lit(1_000_000)
    ).cast("long")
    return sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents).alias("sum_value_c"),
        dur_s.alias("duration_s"),
    ).drop("sid")


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    value_col: str = "value",
) -> DataFrame:
    """Streaming sessionization via ``session_window`` — Spark merges
    events into a session while each lands within ``gap`` of the
    window's current end; the watermark closes sessions and evicts their
    state, so state holds only open sessions regardless of feed size.

    Emits the batch :func:`sessionize` shape (window.start == min ts of
    the session, so ``session_start``/``n_events``/``sum_value_c`` are
    directly comparable — pinned by the batch/stream parity test;
    ``duration_s`` is window length minus the trailing gap, clamped at
    0 for single-event sessions).
    """
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("win"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("sum_value_c"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            "n_events",
            "sum_value_c",
            F.greatest(
                F.lit(0).cast("long"),
                (
                    (
                        _us("win.end")
                        - _us("win.start")
                        - F.lit(gap_us)
                    )
                    / F.lit(1_000_000)
                ).cast("long"),
            ).alias("duration_s"),
        )
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, mode: str = "append"
) -> DataFrame:
    """Execute a streaming plan over all currently-available input
    (availableNow trigger) into an in-memory sink; return the result as
    a batch DataFrame. Used by tests and backfills. Use
    ``mode='complete'`` for aggregations (emits all windows including
    those the final watermark hasn't closed), ``'append'`` for
    row-stream ops like dedup."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def session_paths(
    events: DataFrame,
    gap_minutes: int = 30,
    n: int = 3,
    k: int = 10,
) -> DataFrame:
    """Top-``k`` in-session event-type ``n``-gram paths →
    (path, n_occurrences, rank): the click-path mining query — which
    journeys ("view>click>purchase") actually happen, ranked by how
    often. Session boundaries are :func:`sessionize`'s (same gap rule,
    same microsecond arithmetic, same (ts, event_id) deterministic
    ordering), so the two ops reconcile row-for-row.

    Every occurrence counts (a session repeating a loop contributes
    each repeat); ties rank by path string so the top-k is unique.

    Scale shape: one user_id hash exchange for the session windows
    (shared with sessionize when both run), per-session arrays bounded
    by session length, n-grams built in-array (transform+slice — no
    explode until the 1-row-per-gram count), and the final top-k is a
    TakeOrderedAndProject over the (distinct paths)-sized count table,
    never a global sort of occurrences."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (_us("ts") - _us(F.lag("ts").over(w)) > gap_us),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_sess"),
    )
    sess = flagged.withColumn(
        "sid", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    seqs = sess.groupBy("user_id", "sid").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda s: s["event_type"],
        ).alias("types")
    )
    grams = seqs.where(F.size("types") >= n).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("types") - n),
                lambda i: F.array_join(F.slice("types", i + 1, n), ">"),
            )
        ).alias("path")
    )
    counts = grams.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    wr = Window.orderBy(F.desc("n_occurrences"), F.asc("path"))
    return (
        counts.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= k)
        .select("path", "n_occurrences", F.col("rank").cast("long").alias("rank"))
    )


def session_paths_sql(
    gap_minutes: int = 30, n: int = 3, k: int = 10, table: str = "events"
) -> str:
    """DuckDB twin of :func:`session_paths`."""
    gap_us = gap_minutes * 60 * 1_000_000
    gram = " || '>' || ".join(f"t[i+{j}]" for j in range(n))
    return (
        "WITH flagged AS (SELECT user_id, ts, event_id, event_type, "
        "CASE WHEN LAG(ts) OVER w IS NULL OR "
        f"epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {gap_us} "
        "THEN 1 ELSE 0 END AS new_sess "
        f"FROM {table} WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "sess AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM flagged), "
        "seqs AS (SELECT user_id, sid, "
        "ARRAY_AGG(event_type ORDER BY ts, event_id) AS t "
        "FROM sess GROUP BY user_id, sid), "
        f"grams AS (SELECT {gram} AS path "
        "FROM (SELECT t, generate_subscripts(t, 1) AS i FROM seqs "
        f"WHERE len(t) >= {n}) WHERE i <= len(t) - {n - 1}), "
        "counts AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_occurrences "
        "FROM grams GROUP BY path) "
        "SELECT path, n_occurrences, CAST(ROW_NUMBER() OVER "
        "(ORDER BY n_occurrences DESC, path) AS BIGINT) AS rank "
        f"FROM counts QUALIFY rank <= {k}"
    )


def interval_pairs_stream(
    events: DataFrame,
    probe_type: str = "purchase",
    window_minutes: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STREAM interval join — the canonical Structured Streaming
    two-input stateful operator: purchases (probe stream) inner-joined
    to the same user's other events (build stream) that occurred in the
    preceding ``window_minutes``. Both sides carry watermarks and the
    join predicate carries the time band, so Spark can bound both state
    stores: a build row is dropped once the probe watermark passes
    probe_ts − window (no unbounded buffering, the property that makes
    this run forever at crawl scale).

    The batch twin is ops.events.interval_join_counts (which
    aggregates); this emits the matched PAIRS — pairs are what the
    append-mode stream can emit incrementally, aggregation stacks a
    second stateful stage on top.

    Result rows: (event_id, touch_event_id) — probe id, matched build
    id."""
    probes = (
        events.where(F.col("event_type") == probe_type)
        .select(
            F.col("event_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    builds = (
        events.where(F.col("event_type") != probe_type)
        .select(
            F.col("event_id").alias("touch_event_id"),
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("b_ts"),
        )
        .withWatermark("b_ts", watermark)
    )
    return probes.join(
        builds,
        F.expr(
            "user_id = b_user AND "
            f"b_ts BETWEEN p_ts - INTERVAL {window_minutes} MINUTES "
            "AND p_ts"
        ),
        "inner",
    ).select("event_id", "touch_event_id")
