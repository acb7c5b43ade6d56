"""Brandes betweenness (ppm fixed point), Dirichlet query-likelihood
retrieval, FastRP integer embeddings — hand/Python-replica oracles."""

import hashlib
import math

from pyspark.sql import functions as F

from drone_spark.algorithms.centrality import betweenness_ppm
from drone_spark.algorithms.fastrp import RP_SCALE, fastrp_embeddings
from drone_spark.ops.textstats import lm_dirichlet_topk


def test_betweenness_path(spark):
    """Path 1→2→3, all vertices as sources: only vertex 2 lies on a
    shortest path interior — δ_1(2) = (1·(10^6+0)) DIV 1 = 10^6."""
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = {r["vid"]: r["bc_ppm"] for r in
           betweenness_ppm(edges, n_sources=3, max_depth=4).collect()}
    assert out == {2: 10**6}


def test_betweenness_diamond_splits_mass(spark):
    """Diamond 1→{2,3}→4: σ_1(4)=2, so each middle vertex carries half
    the dependency: δ_1(2) = (1·10^6) DIV 2 = 500000."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4)], "src long, dst long"
    )
    out = {r["vid"]: r["bc_ppm"] for r in
           betweenness_ppm(edges, n_sources=4, max_depth=4).collect()}
    assert out == {2: 500_000, 3: 500_000}


def test_lm_dirichlet_hand_oracle(spark):
    """Docs: d1='a a b', d2='b c c'. Query ['a','c'], μ=2.
    N=6, c_a=2, c_c=2 ⇒ μ·p=2·(2/6)=2/3 for both terms.
    d1: ln((2+2/3)/5) + ln((0+2/3)/5); d2: ln((0+2/3)/5) + ln((2+2/3)/5)
    — equal scores, tie broken by id."""
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c c")], "doc_id long, text string"
    )
    out = lm_dirichlet_topk(docs, ["a", "c"], k=2, mu=2.0).collect()
    want = round(
        math.log((2 + 2.0 * 2 / 6) / 5) + math.log((0 + 2.0 * 2 / 6) / 5), 6
    )
    assert [(r["doc_id"], r["score"]) for r in out] == [(1, want), (2, want)]


def test_lm_dirichlet_drops_oov_terms(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    out = lm_dirichlet_topk(docs, ["zzz", "a"], k=5, mu=2.0).collect()
    # only 'a' contributes; no -inf rows
    assert len(out) == 1
    assert math.isfinite(out[0]["score"])


def _sign(j: int, vid: int) -> int:
    h = int(hashlib.md5(f"rp{j}:{vid}".encode()).hexdigest()[:15], 16)
    return (h & 1) * 2 * RP_SCALE - RP_SCALE


def _py_div(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q  # truncate toward zero


def test_fastrp_matches_python_replica(spark):
    """Star 1→{2,3,4} plus 4→5: replay 2 propagation rounds in Python
    with truncating integer division."""
    pairs = [(1, 2), (1, 3), (1, 4), (4, 5)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    verts = sorted({v for p in pairs for v in p})
    outdeg = {}
    for a, _ in pairs:
        outdeg[a] = outdeg.get(a, 0) + 1
    state = {(v, j): _sign(j, v) for v in verts for j in range(4)}
    for _ in range(2):
        nxt = {(v, j): 0 for v in verts for j in range(4)}
        for a, b in pairs:
            for j in range(4):
                nxt[(b, j)] += _py_div(state[(a, j)], outdeg[a])
        state = nxt
    got = {
        (r["vid"], r["dim"]): r["val"]
        for r in fastrp_embeddings(edges, dims=4, iters=2).collect()
    }
    assert got == state


def test_fastrp_plan_is_jvm_only(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    plan = (
        fastrp_embeddings(edges, dims=2, iters=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_fastrp_clusters_separates_components(spark):
    """Two disjoint dense blobs: FastRP colors each component with a
    consistent sign pattern, so k=2 clustering must separate them
    perfectly (every vertex clustered with its own component)."""
    from drone_spark.algorithms.fastrp import fastrp_embeddings
    from drone_spark.ops.similarity import kmeans_lloyd

    blob_a = [(i, j) for i in range(1, 6) for j in range(1, 6) if i != j]
    blob_b = [(i, j) for i in range(101, 106) for j in range(101, 106)
              if i != j]
    edges = spark.createDataFrame(blob_a + blob_b, "src long, dst long")
    emb = fastrp_embeddings(edges, dims=8, iters=2)
    vecs = emb.groupBy("vid").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, val))), "
            "x -> CAST(x.val AS DOUBLE))"
        ).alias("embedding")
    )
    out = {r["vid"]: r["cluster"] for r in
           kmeans_lloyd(vecs, k=2, iters=1, id_col="vid",
                        vec_col="embedding", salt="t").collect()}
    ca = {out[v] for v in range(1, 6)}
    cb = {out[v] for v in range(101, 106)}
    assert len(ca) == 1 and len(cb) == 1 and ca != cb
