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


def near_dup_stream(
    docs_stream: DataFrame,
    corpus_index: DataFrame,
    sink_path: str,
    checkpoint_dir: str,
    threshold: float = 0.7,
    **lsh_kwargs,
) -> None:
    """Continuous near-dup screening of a document stream against the
    existing corpus: each micro-batch of NEW docs is LSH-paired against
    the (static, persisted) old-corpus table via
    :func:`drone_spark.ops.dedup.minhash_lsh_pairs_incremental` and the
    (a, b, est_jaccard) verdicts append to ``sink_path`` — the
    streaming shape of the daily incremental dedup batch.

    foreachBatch is the right tool (not a stream-stream join): the old
    side is a bounded, slowly-refreshed index, the signature + band
    pipeline is a multi-stage batch plan Structured Streaming can't
    express incrementally, and per-batch cost is proportional to the
    BATCH (the incremental op's contract), with exactly-once sink
    semantics from the checkpointed batch id. Runs with
    ``availableNow`` so tests drain deterministically; a deployment
    drops that trigger."""
    from ..ops.dedup import minhash_lsh_pairs_incremental

    def handle(batch: DataFrame, batch_id: int) -> None:
        pairs = minhash_lsh_pairs_incremental(
            corpus_index, batch, threshold=threshold, **lsh_kwargs
        )
        pairs.write.mode("append").parquet(sink_path)

    q = (
        docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
