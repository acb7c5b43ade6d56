"""TextRank keywords, 4-clique counting, prefix-filtered set-similarity
join — hand oracles + the prefix-filter pruning/losslessness pins."""

from pyspark.sql import functions as F

from drone_spark.algorithms.triangles import four_clique_count
from drone_spark.ops.dedup import ssjoin_prefix_pairs
from drone_spark.ops.textrank import TR_SCALE, textrank_keywords


# ------------------------------------------------------------- textrank
def test_textrank_hub_token_wins(spark):
    """'x' is adjacent to every other token; after any number of
    rounds it holds the largest rank."""
    docs = spark.createDataFrame(
        [(1, "x a x b x c x d")], "doc_id long, text string"
    )
    rows = textrank_keywords(docs, k=10, iters=3).collect()
    assert rows[0]["token"] == "x"
    assert rows[0]["tr_fx"] > rows[1]["tr_fx"]


def test_textrank_symmetric_pair(spark):
    """Two isolated-pair tokens: the stationary rank of 'a b' (a↔b
    only) is exactly TR_SCALE for both (all mass returns each round)."""
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    out = {r["token"]: r["tr_fx"] for r in
           textrank_keywords(docs, k=5, iters=4).collect()}
    assert out == {"a": TR_SCALE, "b": TR_SCALE}


# ----------------------------------------------------------- 4-cliques
def test_four_cliques_k4_and_k5(spark):
    """K4 has exactly 1; K5 has C(5,4) = 5."""
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    k5 = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    c4 = four_clique_count(
        spark.createDataFrame(k4, "src long, dst long")
    ).collect()[0]["n_cliques4"]
    c5 = four_clique_count(
        spark.createDataFrame(k5, "src long, dst long")
    ).collect()[0]["n_cliques4"]
    assert (c4, c5) == (1, 5)


def test_four_cliques_none_in_triangle_or_cycle(spark):
    tri = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long")
    c6 = spark.createDataFrame(
        [(i, i % 6 + 1) for i in range(1, 7)], "src long, dst long"
    )
    assert four_clique_count(tri).collect()[0]["n_cliques4"] == 0
    assert four_clique_count(c6).collect()[0]["n_cliques4"] == 0


# -------------------------------------------------------------- ssjoin
def _naive_pairs(rows, t_ppm):
    sets = {d: set(t.split()) for d, t in rows}
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            union = len(sets[a] | sets[b])
            jp = inter * 1_000_000 // union
            if jp >= t_ppm:
                out[(a, b)] = jp
    return out


def test_ssjoin_matches_naive(spark):
    rows = [
        (1, "red green blue"),
        (2, "red green blue yellow"),
        (3, "red green blue"),
        (4, "cat dog"),
        (5, "cat dog bird"),
        (6, "totally different words here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (500_000, 660_000, 900_000):
        got = {
            (r["a"], r["b"]): r["jacc_ppm"]
            for r in ssjoin_prefix_pairs(docs, threshold_ppm=t).collect()
        }
        assert got == _naive_pairs(rows, t), f"threshold {t}"


def test_ssjoin_prefix_actually_prunes(spark):
    """Disjoint-vocabulary doc groups share only one hot stopword; at
    t=0.9 prefix size is 1 (rarest token), so the stopword never enters
    the index and the candidate count stays far below all-pairs."""
    rows = [(i, f"the w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f w{i}g w{i}h w{i}i")
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = ssjoin_prefix_pairs(docs, threshold_ppm=900_000).collect()
    assert out == []  # no pair is 0.9-similar; and no candidate blowup
