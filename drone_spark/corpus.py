"""Deterministic synthetic Common-Crawl-style page corpus.

Produces the engine's upstream input table with exactly the
BASELINE.json ``input_hint`` shape::

    pages(url: string, warc_ts: timestamp, html: binary,
          text: string, lang: string)

Generation runs **on executors** (``spark.range(n).mapInPandas``), so a
bench-scale corpus is produced in parallel without a driver loop — the
same code path would generate billions of pages on a real cluster.
Every page is a pure function of ``(seed, page index)``: partitioning,
batching and parallelism never change the corpus.

Link structure is a seeded power law (Zipf out-degree, quadratic
preferential attachment on targets) so high-degree skew exists even at
unit-test scale — this is what exercises the salted high-degree
aggregation and mirror/master paths (north_rule). The reference engine
assumed such graphs but generated none (its inputs lived on a private
NFS path, /root/reference/src/tools/Settings.go:9).
"""

from __future__ import annotations

import html as _html
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_LANGS = ("en", "de", "fr", "zh", "es")
_VOCAB = np.array(
    [
        "graph", "vertex", "edge", "rank", "crawl", "web", "link", "node",
        "spark", "shuffle", "partition", "iterate", "converge", "label",
        "component", "triangle", "degree", "mirror", "master", "delta",
        "page", "index", "anchor", "corpus", "token", "stream", "batch",
    ]
)
_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds


def url_for(idx: int) -> str:
    """Deterministic unique URL for page ``idx`` (shared with tests)."""
    return f"http://site{idx % 997}.example/p{idx}"


def _render_html(text: str, out_urls: list[str]) -> bytes:
    """HTML carrying ``text`` losslessly inside <article> plus nav links."""
    links = "".join(f'<a href="{u}">l</a>' for u in out_urls)
    doc = (
        "<html><head><meta charset=\"utf-8\"></head><body>"
        f"<article>{_html.escape(text)}</article>"
        f"<nav>{links}</nav></body></html>"
    )
    return doc.encode("utf-8")


def _gen_one(idx: int, n_pages: int, seed: int) -> tuple:
    rng = np.random.default_rng([seed, idx])
    n_tokens = int(rng.integers(20, 81))
    text = " ".join(_VOCAB[rng.integers(0, len(_VOCAB), n_tokens)])
    # Zipf out-degree (clipped); quadratic preferential attachment on
    # targets concentrates in-links on low indices -> heavy skew.
    outdeg = min(int(rng.zipf(1.7)), 64, n_pages - 1)
    if n_pages <= 1:
        outdeg = 0
    targets: list[int] = []
    seen = {idx}
    for u in rng.random(outdeg):
        t = int(u * u * n_pages)
        if t not in seen:
            seen.add(t)
            targets.append(t)
    out_urls = [url_for(t) for t in targets]
    lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
    ts_us = _EPOCH_US + int(rng.integers(0, 365 * 24 * 3600)) * 1_000_000
    return (
        url_for(idx),
        pd.Timestamp(ts_us, unit="us"),
        _render_html(text, out_urls),
        text,
        lang,
    )


def generate_pages(
    spark: SparkSession, n_pages: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic pages table of ``n_pages`` rows."""
    partitions = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = [_gen_one(int(i), n_pages, seed) for i in batch["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return (
        spark.range(0, n_pages, numPartitions=partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def generate_edges_direct(
    spark: SparkSession,
    n_vertices: int,
    seed: int = 42,
    gen_partitions: int = 256,
) -> DataFrame:
    """Directly synthesize a link-graph edge table with the same
    statistical shape as :func:`generate_pages` + extraction (Zipf
    out-degree, quadratic preferential attachment), skipping the HTML
    round-trip — used for scaling benchmarks where tens of millions of
    edges are needed and extraction throughput would dominate.

    Deterministic independent of cores: generation always uses
    ``gen_partitions`` fixed range partitions, each seeded by its start
    offset; fully vectorized numpy per partition (no per-row Python).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch["id"].to_numpy()
            if len(ids) == 0:
                continue
            rng = np.random.default_rng([seed, int(ids[0])])
            outdeg = np.minimum(rng.zipf(1.7, len(ids)), 64)
            src = np.repeat(ids, outdeg)
            u = rng.random(len(src))
            dst = (u * u * n_vertices).astype(np.int64)
            keep = src != dst
            yield pd.DataFrame({"src": src[keep], "dst": dst[keep]})

    return (
        spark.range(0, n_vertices, numPartitions=gen_partitions)
        .mapInPandas(gen, schema="src long, dst long")
    )
