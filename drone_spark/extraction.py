"""HTML → text + out-link extraction (vectorized Arrow UDFs).

The upstream stage the north rule adds over the reference: turn the
``pages`` table into the link-graph ``edges`` table. All parsing runs in
``mapInPandas`` (Arrow batches, zero per-row Python on the Spark side;
the regex work inside the batch is C-backed via ``pandas.Series.str``).

Invariant (BASELINE.json ``input_hint``): the extracted ``text`` must be
byte-identical to the corpus ``text`` per url — pinned by
tests/test_extraction.py.

Vertex ids: 60-bit integers from md5(url). md5 is available identically
in Spark (``F.md5``), DuckDB (``md5``) and Python (``hashlib``), so
every layer — engine, SQL oracle, pytest oracle — derives the same id
without coordination. The reference instead required ids to *be* the
input format (whitespace ``src dst`` longs,
/root/reference/src/graph/graph.go:341-349).
"""

from __future__ import annotations

import hashlib
import html as _html
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

EXTRACTED_SCHEMA = "url string, text string, out_links array<string>"

_ARTICLE_RE = re.compile(r"<article>(.*?)</article>", re.S)
_HREF_RE = re.compile(r'<a href="([^"]*)"')


def url_to_id_col(url: Column | str) -> Column:
    """60-bit vertex id from url, as a Spark column expression."""
    col = F.col(url) if isinstance(url, str) else url
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def url_to_id_py(url: str) -> int:
    """Python mirror of :func:`url_to_id_col` (oracles/tests)."""
    return int(hashlib.md5(url.encode("utf-8")).hexdigest()[:15], 16)


URL_TO_ID_SQL = "CAST(CONV(SUBSTRING(MD5({u}), 1, 15), 16, 10) AS BIGINT)"


def extract_pages(pages: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """pages → (url, text, out_links) via one Arrow-batched pass.

    ``carry``: extra input columns passed through the kernel unchanged
    (appended after the extracted columns) — the streaming ingestion
    path carries ``warc_ts`` through so the edge stream can
    watermark-dedup on crawl time (streaming/ingest.py)."""
    clash = set(carry) & {"url", "text", "out_links"}
    if clash:
        raise ValueError(
            f"carry columns {sorted(clash)} collide with the extracted "
            "output columns (url, text, out_links) — carrying them "
            "would silently overwrite the extraction result"
        )
    carry_schema = "".join(
        f", {name} {pages.schema[name].dataType.simpleString()}" for name in carry
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            docs = batch["html"].apply(lambda b: b.decode("utf-8"))
            texts = docs.str.extract(_ARTICLE_RE, expand=False).fillna("")
            texts = texts.apply(_html.unescape)
            links = docs.apply(_HREF_RE.findall)
            out = {"url": batch["url"], "text": texts, "out_links": links}
            for name in carry:
                out[name] = batch[name]
            yield pd.DataFrame(out)

    return pages.select("url", "html", *carry).mapInPandas(
        extract, schema=EXTRACTED_SCHEMA + carry_schema
    )


def edges_from_pages(pages: DataFrame, dedup: bool = True) -> DataFrame:
    """pages → edges(src, dst, src_url, dst_url), self-loops dropped.

    The explode + id-hash is pure Catalyst (codegen'd); only the HTML
    parse touches Python. At 100 TB the output is written once to the
    catalog bucketed by ``src`` so iterative jobs never re-extract.
    """
    extracted = extract_pages(pages)
    edges = (
        extracted.select(
            F.col("url").alias("src_url"),
            F.explode("out_links").alias("dst_url"),
        )
        .where(F.col("dst_url") != F.col("src_url"))
        .select(
            url_to_id_col("src_url").alias("src"),
            url_to_id_col("dst_url").alias("dst"),
            "src_url",
            "dst_url",
        )
    )
    if dedup:
        edges = edges.dropDuplicates(["src", "dst"])
    return edges


# scheme://host/...  — one capture group, identical semantics in Spark's
# regexp_extract and DuckDB's (both RE2-ish, group 1)
HOST_RE = "^[a-z]+://([^/]+)"


def host_col(url: Column | str) -> Column:
    """Registrable host of a url, as a Spark column expression."""
    col = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(col, HOST_RE, 1)


HOST_SQL = "regexp_extract({u}, '^[a-z]+://([^/]+)', 1)"  # DuckDB mirror


def host_graph(edges: DataFrame, keep_intra_host: bool = False) -> DataFrame:
    """Page-level link edges → the weighted *host graph*:
    (src_host, dst_host, n_links), the classic webgraph rollup (page
    graph → site graph) the reference never had.

    Input is :func:`edges_from_pages` output (needs ``src_url`` /
    ``dst_url``). Intra-host links (nav boilerplate) are dropped by
    default — pass ``keep_intra_host=True`` for the full matrix.

    Scale shape: a single hash aggregation, fully codegen'd. Host keys
    are few and heavy (millions of pages → ~10^7 hosts, top hosts with
    10^9 in-links), exactly the high→low cardinality agg Spark's
    partial aggregation absorbs: every map task pre-combines its local
    (src_host, dst_host) counts, so the exchange carries at most
    #distinct-host-pairs-per-partition rows, not one row per link.
    No salting needed — the combine is associative and map-side.
    """
    hosts = edges.select(
        host_col("src_url").alias("src_host"),
        host_col("dst_url").alias("dst_host"),
    )
    if not keep_intra_host:
        hosts = hosts.where(F.col("src_host") != F.col("dst_host"))
    return hosts.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("n_links")
    )


def top_hosts(edges: DataFrame, k: int = 20) -> DataFrame:
    """Top-k hosts by weighted cross-host in-links (host authority by
    raw citation). TakeOrderedAndProject plan: per-partition heaps, a
    k-row merge on the driver — never a global sort."""
    return (
        host_graph(edges)
        .groupBy(F.col("dst_host").alias("host"))
        .agg(F.sum("n_links").alias("in_links"))
        .orderBy(F.desc("in_links"), "host")
        .limit(k)
    )


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of a crawl URL, entirely in codegen'd string ops
    (no UDF): strip the fragment, lowercase scheme://host (path case
    preserved), drop explicit default ports (:80 for http, :443 for
    https), drop a single trailing slash on a non-root path. The
    normalization every URL-level dedup / crawl frontier needs before
    hashing — distinct variants of one page must map to one id
    (compose with :func:`url_to_id_col`)."""
    col = F.col(url) if isinstance(url, str) else url
    c = F.regexp_replace(col, "#.*$", "")  # fragment
    pre = F.lower(F.regexp_extract(c, "^([A-Za-z]+://[^/]*)", 1))
    pre = F.regexp_replace(pre, "^(http://[^:]+):80$", "$1")
    pre = F.regexp_replace(pre, "^(https://[^:]+):443$", "$1")
    rest = F.regexp_replace(c, "^[A-Za-z]+://[^/]*", "")
    rest = F.regexp_replace(rest, "(.)/$", "$1")  # '/a/'→'/a', '/' stays
    return F.concat(pre, rest)


# DuckDB textual twin of canonicalize_url (RE2 \\1 backrefs vs Java $1)
CANON_URL_SQL = (
    "concat("
    "regexp_replace(regexp_replace(lower(regexp_extract("
    "regexp_replace({u}, '#.*$', ''), '^([A-Za-z]+://[^/]*)', 1)), "
    "'^(http://[^:]+):80$', '\\1'), '^(https://[^:]+):443$', '\\1'), "
    "regexp_replace(regexp_replace(regexp_replace({u}, '#.*$', ''), "
    "'^[A-Za-z]+://[^/]*', ''), '(.)/$', '\\1'))"
)


_ANCHOR_RE = re.compile(r'<a href="([^"]*)"[^>]*>(.*?)</a>', re.S)
ANCHOR_SCHEMA = "src_url string, dst_url string, anchor string"


def anchors_from_pages(pages: DataFrame) -> DataFrame:
    """pages → (src_url, dst_url, anchor): one row per link occurrence
    with its visible anchor text (HTML-unescaped, whitespace intact —
    normalization is the aggregation's job, keeping this extraction
    byte-faithful like the article text).

    Same Arrow-batched shape as :func:`extract_pages`; the extractall
    runs on the C regex engine inside the batch. Unlike
    ``edges_from_pages``, link *occurrences* are kept (no dedup): a
    page linking twice with different anchors contributes two anchor
    observations — exactly what anchor-text ranking wants."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows_src: list[str] = []
            rows_dst: list[str] = []
            rows_anchor: list[str] = []
            docs = batch["html"].apply(lambda b: b.decode("utf-8"))
            found = docs.str.extractall(_ANCHOR_RE)
            if len(found):
                # extractall index level 0 = row position in the batch
                urls = batch["url"].reset_index(drop=True)
                rows_src = urls.iloc[
                    found.index.get_level_values(0)
                ].tolist()
                rows_dst = found[0].tolist()
                rows_anchor = [_html.unescape(a) for a in found[1]]
            yield pd.DataFrame(
                {"src_url": rows_src, "dst_url": rows_dst,
                 "anchor": rows_anchor}
            )

    return pages.select("url", "html").mapInPandas(
        extract, schema=ANCHOR_SCHEMA
    )


def anchor_text_summary(
    anchors: DataFrame, k: int = 3, min_count: int = 1
) -> DataFrame:
    """Per-target anchor-term profile — the classic IR use of link
    structure (anchor text describes the *target* better than its own
    body; Craswell et al. 2001, and the BM25F anchor field): tokenize
    anchors with the shared normalizer, drop intra-page self-links,
    count (dst_url, term) over link occurrences, keep each target's
    top-``k`` terms (ties broken by term for determinism).

    Plan shape: explode → two-level partial agg on (dst_url, term) →
    per-key top-k via ranked window over the count-aggregated rows
    (input to the window is already one row per (dst, term), so the
    sort is over the *aggregated* table, not the raw occurrences)."""
    from pyspark.sql import Window

    from .ops.textstats import norm_text

    terms = (
        anchors.where(F.col("dst_url") != F.col("src_url"))
        .select(
            "dst_url",
            F.explode(F.split(norm_text("anchor"), " ")).alias("term"),
        )
        .where(F.length("term") > 0)
        .groupBy("dst_url", "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
    )
    w = Window.partitionBy("dst_url").orderBy(F.desc("n"), F.asc("term"))
    return (
        terms.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("dst_url", "term", "n", "rank")
    )


def crawl_schedule(
    urls: DataFrame,
    n_workers: int = 8,
    per_wave: int = 2,
    url_col: str = "url",
    salt: str = "cs0",
) -> DataFrame:
    """Politeness-preserving crawl schedule: (url, host, worker, wave).

    Every URL of a host lands on ONE worker (worker = 60-bit
    md5(salt, host) mod n_workers), so per-host rate limiting is a
    local concern of that worker — the standard frontier-sharding rule
    (Mercator, Heritrix). Within a host, URLs are ordered by
    md5(salt, url) (uniform, layout-independent) and dealt into waves
    of ``per_wave`` fetches: wave k of every host can be issued in the
    k-th politeness interval, so the whole schedule is one static
    table a fleet consumes without coordination.

    Scale shape: one window per (host, hash-bucket)? — not needed:
    the rank is per-host and per-wave quotas are small, but a
    pathological 10⁸-URL host still sorts inside one partition, so the
    rank reuses the two-phase bucket trick ONLY via ordering on the
    hash (windows stay per-host; hosts are the natural parallel axis
    of a frontier and per-host URL counts are crawl-budget-capped
    upstream by design — see crawl_budget)."""
    from pyspark.sql import Window

    h60 = lambda c: F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), c)), 1, 15), 16, 10
    ).cast("long")
    host = host_col(F.col(url_col))
    base = urls.select(
        F.col(url_col).alias("url"),
        host.alias("host"),
        F.pmod(h60(host), F.lit(n_workers)).cast("long").alias("worker"),
        h60(F.col(url_col)).alias("_h"),
    )
    w = Window.partitionBy("host").orderBy("_h", "url")
    return base.select(
        "url",
        "host",
        "worker",
        F.floor((F.row_number().over(w) - 1) / per_wave)
        .cast("long").alias("wave"),
    )


def crawl_schedule_sql(
    urls_sql: str,
    n_workers: int = 8,
    per_wave: int = 2,
    salt: str = "cs0",
    host_extract: str = "regexp_extract({u}, '^[a-z]+://([^/]+)', 1)",
) -> str:
    """DuckDB twin of :func:`crawl_schedule`. ``urls_sql`` is a complete
    SELECT returning one column ``url``."""
    h60 = lambda e: f"('0x' || substr(md5('{salt}:' || {e}), 1, 15))::BIGINT"
    host = host_extract.format(u="url")
    return (
        f"WITH u AS ({urls_sql}), "
        f"base AS (SELECT url, {host} AS host, "
        f"CAST({h60(host)} % {n_workers} AS BIGINT) AS worker, "
        f"{h60('url')} AS h FROM u) "
        "SELECT url, host, worker, "
        f"CAST((ROW_NUMBER() OVER (PARTITION BY host ORDER BY h, url) - 1) "
        f"// {per_wave} AS BIGINT) AS wave FROM base"
    )


def url_depth_stats(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host URL path-depth profile: (host, n_urls, sum_depth,
    max_depth, avg_depth_ppm) where depth = number of '/' separators
    after the authority (http://h/a/b → 2) and avg_depth_ppm =
    ⌊10⁶·sum_depth / n_urls⌋. Crawl-frontier prioritizers and quality
    filters both key on this (deep URLs are disproportionately
    calendar/faceted-search traps — the classic crawler-politeness
    heuristic), and it's a pure two-expression scan + one partial-agg
    groupBy, so it runs at full codegen speed at any scale.

    Exact integers throughout (the harmonic_ppm convention) — the
    DuckDB oracle hash-matches bit-for-bit."""
    col = F.col(url_col)
    path = F.regexp_replace(col, r"^[a-z]+://[^/]*", "")
    depth = (F.length(path) - F.length(F.regexp_replace(path, "/", ""))).cast(
        "long"
    )
    return (
        urls.select(host_col(col).alias("host"), depth.alias("d"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.sum("d").cast("long").alias("sum_depth"),
            F.max("d").cast("long").alias("max_depth"),
        )
        .withColumn(
            "avg_depth_ppm", F.expr("(1000000 * sum_depth) div n_urls")
        )
    )


def url_depth_stats_sql(urls_cte: str, url_col: str = "url") -> str:
    """DuckDB twin of :func:`url_depth_stats` over a CTE chain whose
    final table ``u(url)`` holds one row per url."""
    path = f"regexp_replace({url_col}, '^[a-z]+://[^/]*', '')"
    return (
        f"WITH {urls_cte}, "
        f"d AS (SELECT {HOST_SQL.format(u=url_col)} AS host, "
        f"CAST(length({path}) - length(replace({path}, '/', ''))"
        " AS BIGINT) AS d FROM u) "
        "SELECT host, CAST(COUNT(*) AS BIGINT) AS n_urls, "
        "CAST(SUM(d) AS BIGINT) AS sum_depth, "
        "CAST(MAX(d) AS BIGINT) AS max_depth, "
        "CAST((1000000 * SUM(d)) // COUNT(*) AS BIGINT) AS avg_depth_ppm "
        "FROM d GROUP BY host"
    )


def url_templates(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """URL template mining: collapse every digit run to ``#`` and
    aggregate (template, n_urls, n_hosts, max_host_urls) — the
    crawl-frontier primitive behind spider-trap detection and
    template-level dedup (a calendar/faceted-search URL space shows up
    as one template with an enormous per-host URL count; Mercator-style
    frontiers cap fetches per template, and near-dup pipelines drop
    boilerplate at template granularity).

    ``max_host_urls`` is the largest single-host URL count under the
    template: the trap signal proper (many hosts sharing a template is
    normal platform reuse; one host minting millions of URLs of one
    template is a trap).

    Plan shape: one projection (two regexp_replace + host extract) →
    partial-agg groupBy(template, host) → groupBy(template) — both
    aggregations map-side combine, COUNT(DISTINCT host) rewritten as
    the two-level rollup so no distinct-expansion hits the shuffle."""
    col = F.col(url_col)
    per_host = (
        urls.select(
            F.regexp_replace(col, "[0-9]+", "#").alias("template"),
            host_col(col).alias("host"),
        )
        .groupBy("template", "host")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return per_host.groupBy("template").agg(
        F.sum("n").cast("long").alias("n_urls"),
        F.count(F.lit(1)).cast("long").alias("n_hosts"),
        F.max("n").cast("long").alias("max_host_urls"),
    )


def url_templates_sql(urls_cte: str, url_col: str = "url") -> str:
    """DuckDB twin of :func:`url_templates` over a CTE chain whose
    final table ``u(url)`` holds one row per url."""
    return (
        f"WITH {urls_cte}, "
        f"t AS (SELECT regexp_replace({url_col}, '[0-9]+', '#', 'g')"
        f" AS template, {HOST_SQL.format(u=url_col)} AS host FROM u), "
        "ph AS (SELECT template, host, CAST(COUNT(*) AS BIGINT) AS n"
        " FROM t GROUP BY template, host) "
        "SELECT template, CAST(SUM(n) AS BIGINT) AS n_urls, "
        "CAST(COUNT(*) AS BIGINT) AS n_hosts, "
        "CAST(MAX(n) AS BIGINT) AS max_host_urls "
        "FROM ph GROUP BY template"
    )
