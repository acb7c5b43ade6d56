"""Streaming windowed aggregation + dedup over an events directory.

Batch/stream parity: each streaming op has the exact batch equivalent
used by its test — the streaming plan with an ``availableNow`` trigger
over a static directory must produce identical results.

At production scale the source is ``readStream`` on the ingestion
bucket (or Kafka); watermarks bound state so a 100 TB/day event feed
holds only the open windows in state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

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
