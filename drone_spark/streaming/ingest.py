"""Streaming crawl ingestion: pages stream → deduped link-edge stream.

The continuous version of the upstream extraction stage (the reference
has no streaming at all — SURVEY §2.8): a crawler drops page batches
into the ingestion path; ``readStream`` picks them up, the SAME
Arrow-batched extraction kernel parses them (``extract_pages`` is
streaming-compatible — ``mapInPandas`` runs unchanged on streaming
DataFrames), and the resulting edge stream is deduplicated within a
watermark horizon: a page re-crawled inside the horizon re-emits its
out-links, and only the first sighting of each ``(src, dst)`` passes.

State stays bounded — the dedup store holds only the horizon's keys
(at 10^12 documents the horizon is the crawl revisit period, not the
corpus). Re-crawls *beyond* the horizon re-emit by design: appends land
in the catalog edge table and the periodic compaction
(``ops.dedup.exact_dedup`` semantics on ``(src, dst)``) is the
batch-side idempotency backstop. Downstream, each new edge-table
version re-ranks via warm-start PageRank
(``algorithms.pagerank.pagerank(warm_start=...)``) — the full
continuous crawl → extract → dedup → re-rank loop.

Batch/stream parity pinned by tests/test_streaming.py: the streamed
edge set over a static directory equals the batch
``edges_from_pages`` distinct edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..corpus import PAGES_SCHEMA
from ..extraction import extract_pages, url_to_id_col


def read_pages_stream(
    spark: SparkSession, path: str, max_files: int = 8
) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def edges_stream(pages: DataFrame, watermark: str = "1 day") -> DataFrame:
    """pages stream → (src, dst, warc_ts) edge stream, self-loops
    dropped, (src, dst) deduped within the watermark horizon."""
    extracted = extract_pages(pages, carry=("warc_ts",))
    edges = (
        extracted.select(
            F.col("url").alias("src_url"),
            "warc_ts",
            F.explode("out_links").alias("dst_url"),
        )
        .where(F.col("dst_url") != F.col("src_url"))
        .select(
            url_to_id_col("src_url").alias("src"),
            url_to_id_col("dst_url").alias("dst"),
            "warc_ts",
        )
    )
    return edges.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["src", "dst"]
    )
