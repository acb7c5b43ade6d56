"""Round-5 continuation ops: Backstrom–Kleinberg dispersion, two-pass
exact Misra–Gries heavy hitters, Dunning G² bigram collocations —
hand oracles on tiny inputs plus the invariants that make each safe
at scale (cap bound, partition-layout independence, zero-cell G²)."""

import math

import pytest
from pyspark.sql import functions as F

from drone_spark.algorithms.linkstats import dispersion, edge_embeddedness
from drone_spark.ops.corpusstats import llr_bigrams
from drone_spark.ops.sketches import heavy_hitters


# ---------------------------------------------------------- dispersion
def test_dispersion_hand_oracle(spark):
    """Edge (1,2) with common neighbors {3,4,5}: 3–4 adjacent, 3–5 and
    4–5 not → dispersion 2. Edge (3,4) has common neighbors {1,2} and
    1–2 adjacent → dispersion 0."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3), (2, 4), (2, 5), (3, 4)],
        "src long, dst long",
    )
    out = {
        (r["src"], r["dst"]): (r["cn_capped"], r["dispersion"])
        for r in dispersion(edges).collect()
    }
    assert out[(1, 2)] == (3, 2)
    assert out[(3, 4)] == (2, 0)
    # edges with <2 common neighbors are not emitted: (1,5) shares
    # only vertex 2 with its endpoint's neighborhoods
    assert (1, 5) not in out


def test_dispersion_cap_bounds_pairs(spark):
    """With cn_cap=2 only the 2 smallest common neighbors {3,4} of
    (1,2) enter the pair join — 3–4 adjacent → dispersion 0; the
    reported cn_capped reflects the cap, keeping the statistic
    self-consistent."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3), (2, 4), (2, 5), (3, 4)],
        "src long, dst long",
    )
    out = {
        (r["src"], r["dst"]): (r["cn_capped"], r["dispersion"])
        for r in dispersion(edges, cn_cap=2).collect()
    }
    assert out[(1, 2)] == (2, 0)


def test_dispersion_consistent_with_embeddedness(spark):
    """Uncapped cn_capped equals embeddedness, and dispersion is
    bounded by C(embeddedness, 2)."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3), (2, 4), (2, 5), (3, 4),
         (4, 5), (2, 6), (1, 6)],
        "src long, dst long",
    )
    emb = {
        (r["src"], r["dst"]): r["embeddedness"]
        for r in edge_embeddedness(edges).collect()
    }
    for r in dispersion(edges, cn_cap=1000).collect():
        e = emb[(r["src"], r["dst"])]
        assert r["cn_capped"] == e
        assert 0 <= r["dispersion"] <= e * (e - 1) // 2


# ------------------------------------------------------- heavy hitters
def test_heavy_hitters_exact_and_layout_independent(spark):
    """60×a + 30×b + 10 singletons, k=3 → threshold N/k = 100/3: only
    'a' (60) and 'b' (30)? 30·3=90 < 100 → only 'a'. The result must
    be identical under different partition layouts (the candidate set
    varies; the recount filter does not)."""
    rows = [("a",)] * 60 + [("b",)] * 30 + [(f"s{i}",) for i in range(10)]
    for parts in (1, 7):
        df = spark.createDataFrame(rows, "v string").repartition(parts)
        got = {(r["v"], r["cnt"]) for r in heavy_hitters(df, k=3).collect()}
        assert got == {("a", 60)}


def test_heavy_hitters_matches_exact_groupby(spark):
    """Two-pass output == exact GROUP BY ... HAVING cnt·k > N."""
    rows = [(f"t{i % 13}",) for i in range(400)] + [("hub",)] * 100
    df = spark.createDataFrame(rows, "v string").repartition(5)
    k = 8
    n = df.count()
    exact = {
        (r["v"], r["c"])
        for r in df.groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") * k > n)
        .collect()
    }
    got = {(r["v"], r["cnt"]) for r in heavy_hitters(df, k=k).collect()}
    assert got == exact and ("hub", 100) in got


# -------------------------------------------------------- llr bigrams
def _g2(n12, c1, c2, n):
    def term(o, r, c):
        return 0.0 if o <= 0 else o * math.log((o * n) / (r * c))

    return 2.0 * (
        term(n12, c1, c2)
        + term(c1 - n12, c1, n - c2)
        + term(c2 - n12, n - c1, c2)
        + term(n - c1 - c2 + n12, n - c1, n - c2)
    )


def test_llr_bigrams_hand_oracle(spark):
    """'x y' repeated 6× in one doc + filler: bigram stream per doc is
    positional, G² matches the NumPy-free python contingency calc."""
    docs = spark.createDataFrame(
        [
            (1, "x y x y x y x y x y x y"),
            (2, "p q r p q r p q r p q r"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["t1"], r["t2"]): (r["n12"], r["llr"])
        for r in llr_bigrams(docs, min_pair=4).collect()
    }
    # doc1: 11 bigrams: (x,y)×6, (y,x)×5; doc2: 11 bigrams:
    # (p,q)×4, (q,r)×4, (r,p)×3. N=22.
    n = 22
    n12, c1, c2 = 6, 6, 6  # (x,y): t1=x starts 6, t2=y ends 6
    assert out[("x", "y")][0] == 6
    assert out[("x", "y")][1] == pytest.approx(
        round(_g2(n12, c1, c2, n), 4), abs=1e-4
    )
    assert out[("p", "q")][0] == 4
    assert ("r", "p") not in out  # n12=3 < min_pair


def test_llr_bigrams_no_cross_doc_bigrams(spark):
    """The last token of doc A never pairs with the first of doc B."""
    docs = spark.createDataFrame(
        [(i, "alpha omega") for i in range(10)],
        "doc_id long, text string",
    )
    rows = llr_bigrams(docs, min_pair=1).collect()
    assert {(r["t1"], r["t2"]) for r in rows} == {("alpha", "omega")}
    assert rows[0]["n12"] == 10
