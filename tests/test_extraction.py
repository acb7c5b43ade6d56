"""Extraction invariants (BASELINE.json input_hint; FIXTURES.md F1/F2)."""

from pyspark.sql import functions as F

from drone_spark.corpus import generate_pages
from drone_spark.extraction import edges_from_pages, extract_pages, url_to_id_py


def test_text_byte_identity(spark, small_pages):
    ext = extract_pages(small_pages).withColumnRenamed("text", "etext")
    joined = small_pages.select("url", "text").join(ext, "url")
    assert joined.count() == small_pages.count()
    assert joined.where(F.col("text") != F.col("etext")).count() == 0


def test_corpus_deterministic_across_partitioning(spark, small_pages):
    again = generate_pages(spark, 200, seed=42, partitions=3)
    cols = ["url", "text", "lang", "warc_ts"]
    assert small_pages.select(cols).exceptAll(again.select(cols)).count() == 0


def test_edges_no_self_loops_no_dups(small_edges):
    assert small_edges.where("src = dst").count() == 0
    assert small_edges.count() == small_edges.distinct().count()


def test_id_hash_consistent_spark_python(spark, small_pages):
    from drone_spark.extraction import edges_from_pages

    rows = edges_from_pages(small_pages).select("src", "src_url").limit(20).collect()
    assert rows
    for r in rows:
        assert r.src == url_to_id_py(r.src_url)


def test_skew_exists(small_edges_pd):
    # the corpus must produce hub vertices so skew paths are exercised
    indeg = small_edges_pd.groupby("dst").size()
    assert indeg.max() >= 20  # quadratic preferential attachment -> hubs


def test_host_graph_matches_pandas(spark, small_pages):
    """host_graph == a pandas recomputation over the same page edges."""
    import re

    from drone_spark.extraction import host_graph

    edges = edges_from_pages(small_pages)
    got = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_graph(edges).collect()
    }
    pat = re.compile(r"^[a-z]+://([^/]+)")
    exp = {}
    for r in edges.select("src_url", "dst_url").collect():
        sh, dh = pat.match(r.src_url).group(1), pat.match(r.dst_url).group(1)
        if sh != dh:
            exp[(sh, dh)] = exp.get((sh, dh), 0) + 1
    assert got == exp
    assert all(sh != dh for sh, dh in got)  # intra-host dropped


def test_top_hosts_ranking(spark, small_pages):
    from drone_spark.extraction import host_graph, top_hosts

    edges = edges_from_pages(small_pages)
    hg = host_graph(edges).groupBy("dst_host").agg(
        F.sum("n_links").alias("n")
    )
    exp = sorted(
        ((r.dst_host, r.n) for r in hg.collect()),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    got = [(r.host, r.in_links) for r in top_hosts(edges, k=5).collect()]
    assert got == exp


def test_canonicalize_url_cases(spark):
    """Fragment/case/default-port/trailing-slash normalization; DuckDB
    textual twin produces identical strings (oracle precondition)."""
    import duckdb

    from drone_spark.extraction import CANON_URL_SQL, canonicalize_url

    cases = {
        "HTTP://Site5.Example:80/Path/To/P1#frag": "http://site5.example/Path/To/P1",
        "https://a.example:443/x/": "https://a.example/x",
        "http://b.example/": "http://b.example/",   # root slash kept
        "http://c.example:8080/y#z": "http://c.example:8080/y",  # non-default port kept
        "https://D.example/Q/": "https://d.example/Q",
        "http://e.example": "http://e.example",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = [r[0] for r in df.select(canonicalize_url("url")).collect()]
    assert got == list(cases.values())
    con = duckdb.connect()
    con.execute("CREATE TABLE u(url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?)", [(u,) for u in cases])
    duck = [r[0] for r in con.execute(
        f"SELECT {CANON_URL_SQL.format(u='url')} FROM u").fetchall()]
    assert duck == list(cases.values())


def test_canonical_urls_query_collapses_every_variant_pair(spark):
    """Driver query invariant: every messy/clean pair maps to ONE
    canonical url (n_variants == 2 for all rows) — proves the
    canonicalizer collapses, independent of the SQL oracle."""
    import __spark_entry__ as E

    out = E.q_canonical_urls(spark, "/root/testdata/sf0.001")
    assert out.where("n_variants != 2").count() == 0
    assert out.count() > 0


def test_anchors_from_pages_and_summary(spark):
    from drone_spark.extraction import anchor_text_summary, anchors_from_pages

    pages = spark.createDataFrame(
        [
            (
                "http://a.example/p1",
                (
                    '<html><a href="http://b.example/x">Great  Search engine</a>'
                    '<a href="http://c.example/y">docs &amp; news</a>'
                    '<a href="http://b.example/x">search</a>'
                    '<a href="http://a.example/p1">self nav</a></html>'
                ).encode(),
            ),
            (
                "http://d.example/p2",
                '<html><a href="http://b.example/x">SEARCH now</a></html>'.encode(),
            ),
        ],
        "url string, html binary",
    )
    anchors = anchors_from_pages(pages)
    got = sorted(map(tuple, anchors.collect()))
    assert ("http://a.example/p1", "http://c.example/y", "docs & news") in got
    assert len(got) == 5  # all occurrences kept, incl self-link row

    summary = anchor_text_summary(anchors, k=2)
    rows = {
        (r["dst_url"], r["rank"]): (r["term"], r["n"])
        for r in summary.collect()
    }
    # b.example/x: 'search' appears 3x (two pages), 'engine'/'great'/'now' 1x
    assert rows[("http://b.example/x", 1)] == ("search", 3)
    assert rows[("http://b.example/x", 2)][1] == 1
    # self-link anchors are excluded
    assert not any(d == "http://a.example/p1" for d, _ in rows)


def test_crawl_schedule_politeness_invariants(spark):
    """One worker per host; waves within a host are dealt in quota-2
    packs (wave k has exactly 2 URLs until the remainder); the whole
    schedule is layout-independent."""
    from drone_spark.extraction import crawl_schedule

    urls = [(f"http://h{i % 3}.example/p{i}",) for i in range(13)]
    df = spark.createDataFrame(urls, "url string")
    sched = crawl_schedule(df, n_workers=4, per_wave=2)
    rows = sched.collect()
    per_host_workers = {}
    for r in rows:
        per_host_workers.setdefault(r["host"], set()).add(r["worker"])
    assert all(len(ws) == 1 for ws in per_host_workers.values())
    from collections import Counter

    for host in per_host_workers:
        waves = Counter(r["wave"] for r in rows if r["host"] == host)
        n = sum(waves.values())
        for k in range(n // 2):
            assert waves[k] == 2
        if n % 2:
            assert waves[n // 2] == 1
    a = sorted(map(tuple, rows))
    b = sorted(map(tuple, crawl_schedule(
        df.repartition(5), n_workers=4, per_wave=2).collect()))
    assert a == b


def test_crawl_schedule_matches_duckdb_twin(spark):
    import duckdb

    from drone_spark.extraction import crawl_schedule, crawl_schedule_sql

    urls = [(f"http://site{i % 7}.example/page/{i}",) for i in range(40)]
    df = spark.createDataFrame(urls, "url string")
    got = sorted(map(tuple, crawl_schedule(df, n_workers=8,
                                           per_wave=3).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE f(url VARCHAR)")
    con.executemany("INSERT INTO f VALUES (?)", urls)
    want = sorted(map(tuple, con.execute(crawl_schedule_sql(
        "SELECT url FROM f", n_workers=8, per_wave=3)).fetchall()))
    assert got == want
