"""End-to-end continuous-crawl loop: day-0 crawl → bucketed edge
table → PageRank; day-1 delta crawl → streaming ingestion → bucketed
append → warm-start re-rank. Pins the full
crawl → extract → dedup → store → rank cycle the docs claim
(docs/SCALE.md "Continuous ingestion")."""

import numpy as np
from pyspark.sql import functions as F

from drone_spark.algorithms.pagerank import pagerank
from drone_spark.extraction import edges_from_pages
from drone_spark.corpus import generate_pages
from drone_spark.sources.bucketed import (
    read_bucketed_edges, write_bucketed_edges,
)
from drone_spark.streaming.ingest import edges_stream, read_pages_stream
from drone_spark.streaming.windows import run_available_now
from tests.oracles import numpy_pagerank


def test_daily_crawl_warm_start_rerank(spark, engine, tmp_path):
    pages = generate_pages(spark, 300, seed=42).cache()
    is_day0 = F.pmod(F.xxhash64("url"), F.lit(4)) < 3
    day0, delta = pages.where(is_day0), pages.where(~is_day0)

    # day 0: batch extract → bucketed catalog table → rank
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    write_bucketed_edges(
        edges_from_pages(day0).select("src", "dst"),
        "pipe_edges", str(tmp_path / "eb"), n_buckets=n,
    )
    try:
        base = pagerank(
            spark, engine, read_bucketed_edges(spark, "pipe_edges"),
            run_id="pipe_day0", tol=1e-6, pre_partitioned=True,
        )

        # day 1: delta crawl lands as files → streaming ingestion →
        # append into the bucketed table
        ddir = str(tmp_path / "delta_pages")
        delta.write.parquet(ddir)
        new_edges = run_available_now(
            edges_stream(read_pages_stream(spark, ddir)), "pipe_delta"
        ).select("src", "dst")
        new_edges.write.mode("append").insertInto("pipe_edges")

        updated = read_bucketed_edges(spark, "pipe_edges")
        # the appended table still satisfies the scatter join's
        # distribution from the scan: no edge-side exchange
        from tests.plan_utils import scatter_exchanges

        assert "src" not in scatter_exchanges(spark, updated)

        warm = pagerank(
            spark, engine, updated, run_id="pipe_day1", tol=1e-6,
            pre_partitioned=True, warm_start=base.state,
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS pipe_edges")

    # oracle: numpy power iteration over the full batch-extracted graph
    full = edges_from_pages(pages).select("src", "dst")
    exp = numpy_pagerank([(r["src"], r["dst"]) for r in full.collect()])
    got = {r["vid"]: r["pr"] for r in warm.state.collect()}
    assert set(got) == set(exp)
    diffs = np.array([abs(got[v] - exp[v]) for v in exp])
    assert diffs.max() < 1e-5
    assert warm.converged
