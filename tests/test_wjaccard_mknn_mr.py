"""Round-5 continuation ops, batch 5: weighted Jaccard, mutual kNN,
hubness, Molloy–Reed — hand oracles and the two-phase cap contract."""

from pyspark.sql import functions as F

from drone_spark.algorithms.linkstats import molloy_reed
from drone_spark.ops.dedup import weighted_jaccard_pairs
from drone_spark.ops.similarity import hubness, mutual_knn


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


# ------------------------------------------------------ weighted jaccard
def test_weighted_jaccard_counts_multiplicity(spark):
    """'a a b' vs 'a b b': Σmin = min(2,1)+min(1,2) = 2,
    Σmax = 3+3-2 = 4 → 500000 ppm. The set Jaccard would be 1.0 —
    the weighted form distinguishes repeat profiles."""
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a b b")], "doc_id long, text string"
    )
    out = weighted_jaccard_pairs(docs, threshold_ppm=1).collect()
    assert len(out) == 1
    assert out[0]["wjaccard_ppm"] == 500_000


def test_weighted_jaccard_identical_docs_1e6(spark):
    docs = spark.createDataFrame(
        [(1, "x y x z"), (2, "x y x z")], "doc_id long, text string"
    )
    out = weighted_jaccard_pairs(docs, threshold_ppm=1).collect()
    assert out[0]["wjaccard_ppm"] == 1_000_000


def test_weighted_jaccard_cap_exact_scores(spark):
    """With max_doc_freq=1 the only shared tokens (df=2) are all
    capped out of candidate generation → no pairs; with the cap off
    the score is exact over all shared tokens."""
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a b b")], "doc_id long, text string"
    )
    assert weighted_jaccard_pairs(docs, threshold_ppm=1, max_doc_freq=1).collect() == []
    out = weighted_jaccard_pairs(docs, threshold_ppm=1, max_doc_freq=None).collect()
    assert out[0]["wjaccard_ppm"] == 500_000


# ----------------------------------------------------------- mutual knn
def test_mutual_knn_reciprocity(spark):
    """Two tight pairs + one bridge: with k=1, (1,2) and (3,4) are
    mutual; the bridge 5 points at 1 but 1 points at 2, so no pair
    with 5 survives."""
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.01, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 1.0, 0.01]),
        (5, [0.9, 0.4, 0.0]),
    ]
    got = {(r["a"], r["b"]) for r in mutual_knn(_emb(spark, rows), k=1).collect()}
    assert got == {(1, 2), (3, 4)}


def test_hubness_histogram_sums_to_corpus(spark):
    rows = [(i, [1.0, float(i % 4), float(i % 3)]) for i in range(12)]
    out = hubness(_emb(spark, rows), k=3).collect()
    assert sum(r["n_vecs"] for r in out) == 12
    # every vector emits k edges → total occurrences = 12·3
    assert sum(r["occ"] * r["n_vecs"] for r in out) == 36


# ---------------------------------------------------------- molloy-reed
def test_molloy_reed_star_vs_cycle(spark):
    """4-cycle: every deg=2 → κ = 2 exactly, NOT supercritical
    (criterion is strict). Star K1,4: degs 4,1,1,1,1 → ⟨k²⟩=20/5=4,
    ⟨k⟩=8/5 → κ=2.5e6 ppm, supercritical."""
    cycle = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    r = molloy_reed(cycle).collect()[0]
    assert r["kappa_ppm"] == 2_000_000 and not r["supercritical"]
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long"
    )
    r = molloy_reed(star).collect()[0]
    assert r["n_vertices"] == 5
    assert r["mean_deg_ppm"] == 1_600_000
    assert r["kappa_ppm"] == 2_500_000 and r["supercritical"]
