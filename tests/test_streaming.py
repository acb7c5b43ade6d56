"""Streaming ops: batch/stream parity over the events table."""

import pytest
from pyspark.sql import functions as F

from drone_spark.streaming.windows import (
    dedup_stream, hourly_counts, read_events_stream, run_available_now,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_batch(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").cache()


@pytest.fixture(scope="module")
def events_dir(spark, events_batch, tmp_path_factory):
    # streaming file sources need a directory, not a single parquet file
    d = str(tmp_path_factory.mktemp("events_stream") / "events")
    events_batch.write.parquet(d)
    return d


def test_hourly_counts_stream_matches_batch(spark, events_batch, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = run_available_now(hourly_counts(stream), "t_hourly", mode="complete")
    exp = (
        events_batch.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
    )
    assert got.count() == exp.count()
    diff = got.select("hour", "event_type", "n_events").exceptAll(
        exp.select("hour", "event_type", "n_events")
    )
    assert diff.count() == 0


def test_stream_dedup(spark, events_batch, tmp_path):
    # duplicate the whole input: dedup must return exactly the originals
    dup_dir = str(tmp_path / "dup")
    events_batch.unionAll(events_batch).repartition(4).write.parquet(dup_dir)
    stream = read_events_stream(spark, dup_dir)
    got = run_available_now(dedup_stream(stream), "t_dedup", mode="append")
    assert got.count() == events_batch.count()
    assert got.select("event_id").distinct().count() == events_batch.count()
