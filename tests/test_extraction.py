"""Extraction invariants (BASELINE.json input_hint; FIXTURES.md F1/F2)."""

from pyspark.sql import functions as F

from drone_spark.corpus import generate_pages
from drone_spark.extraction import extract_pages, url_to_id_py


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
