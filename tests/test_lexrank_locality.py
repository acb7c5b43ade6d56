"""Round-5 continuation ops, batch 9: LexRank over the TF-IDF cosine
doc graph, per-host edge locality, tfidf_cosine_pairs refactor."""

from pyspark.sql import functions as F

import __spark_entry__ as entry
from drone_spark.ops.corpusstats import tfidf_cosine_pairs, tfidf_cosine_topk


def test_tfidf_pairs_threshold_consistent_with_topk(spark):
    """pairs(threshold) == the topk scorer filtered at the same
    threshold — the refactor didn't change the scorer."""
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b b c a"), (3, "c c c b a"), (4, "a c")],
        "doc_id long, text string",
    )
    top = tfidf_cosine_topk(docs, min_df=1, max_df_den=1, k=100).collect()
    thr = 0.2
    expect = {(r["a"], r["b"], r["cosine"]) for r in top if r["cosine"] >= thr}
    got = {(r["a"], r["b"], r["cosine"])
           for r in tfidf_cosine_pairs(docs, thr, min_df=1, max_df_den=1).collect()}
    assert got == expect and got


def test_lexrank_ranks_the_connected_docs(spark, tmp_path):
    """Three near-identical docs + one outlier: the doc-similarity
    graph connects only the triplet, so the outlier never enters the
    ranking and the triplet shares identical integer PR."""
    docs = spark.createDataFrame(
        [
            (1, "spark iceberg engine over web graph"),
            (2, "spark iceberg engine over web graph"),
            (3, "spark iceberg engine over web graph"),
            (4, "completely unrelated noise words here"),
        ],
        "doc_id long, text string",
    )
    sf = str(tmp_path / "sf")
    docs.write.parquet(f"{sf}/documents.parquet")
    out = {r["vid"]: r["pr_fx"] for r in entry.q_lexrank5(spark, sf).collect()}
    assert set(out) == {1, 2, 3}
    assert len(set(out.values())) == 1


def test_edge_locality_all_intra_host(spark, tmp_path):
    """Edges constructed fully intra-host read locality 1e6 ppm."""
    rows = []
    for i in range(30):
        part = i + 1
        order = (10_000_000 + part) % 199 + 199 * (i + 2)
        rows.append((order, part))
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    sf = str(tmp_path / "sf")
    li.write.parquet(f"{sf}/lineitem.parquet")
    out = entry.q_edge_locality(spark, sf).collect()
    assert out and all(
        r["cross_edges"] == 0 and r["locality_ppm"] == 1_000_000 for r in out
    )
