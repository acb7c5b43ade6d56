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


def test_edges_stream_matches_batch(spark, small_pages, tmp_path):
    """Streaming crawl ingestion parity: the streamed (extract →
    watermark-deduped) edge set over a static pages directory equals
    the batch edges_from_pages distinct edge set."""
    from drone_spark.extraction import edges_from_pages
    from drone_spark.streaming.ingest import edges_stream, read_pages_stream

    d = str(tmp_path / "pages")
    small_pages.write.parquet(d)
    got = run_available_now(
        edges_stream(read_pages_stream(spark, d)), "t_edges_stream"
    ).select("src", "dst")
    exp = edges_from_pages(small_pages).select("src", "dst")
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_edges_stream_dedups_recrawl(spark, small_pages, tmp_path):
    """A page re-crawled within the watermark horizon re-emits its
    out-links; the edge stream must pass each (src, dst) exactly once."""
    from drone_spark.extraction import edges_from_pages
    from drone_spark.streaming.ingest import edges_stream, read_pages_stream

    recrawl = small_pages.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 HOUR")
    )
    d = str(tmp_path / "pages_recrawl")
    small_pages.unionByName(recrawl).repartition(4).write.parquet(d)
    got = run_available_now(
        edges_stream(read_pages_stream(spark, d)), "t_edges_recrawl"
    )
    assert got.count() == edges_from_pages(small_pages).count()
    assert got.select("src", "dst").distinct().count() == got.count()
