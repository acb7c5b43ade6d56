"""WL refinement, triad census, RRF fusion, BPE merge pairs — hand
oracles on small graphs/corpora plus plan pins (all four are pure-JVM
relational plans)."""

import pytest
from pyspark.sql import functions as F

from drone_spark.algorithms.triads import triad_census
from drone_spark.algorithms.wl import wl_refinement
from drone_spark.ops.fusion import ordinal_rank, rrf_fuse
from drone_spark.ops.textstats import bpe_merge_pairs


# ------------------------------------------------------------------ WL
def test_wl_distinguishes_path_endpoints(spark):
    """Path 1-2-3-4-5: by symmetry {1,5}, {2,4} share colors at every
    round; 3 is distinguished from 2/4 at round ≥ 2 (its neighbors'
    neighborhoods differ). All classes stable by round 3."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    colors = {r["vid"]: r["color"] for r in wl_refinement(edges, rounds=3).collect()}
    assert colors[1] == colors[5]
    assert colors[2] == colors[4]
    assert len({colors[1], colors[2], colors[3]}) == 3


def test_wl_regular_graph_single_color(spark):
    """A cycle is vertex-transitive: 1-WL can never split it — one
    color class regardless of rounds."""
    n = 6
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    out = wl_refinement(edges, rounds=3).select("color").distinct().collect()
    assert len(out) == 1


# ---------------------------------------------------------------- triads
def test_triad_census_hand_graph(spark):
    """Graph: 1→2, 2→1 (mutual); 1→3, 3→2 (asym); plus 1→2,2→3? Keep
    it explicit: edges {1→2, 2→1, 1→3, 3→2}.
    Pairs: {1,2} mutual; {1,3}, {2,3} asym.
    Transitive (a→b,b→c,a→c): (1,3,2): 1→3,3→2,1→2 ✓; (3,2,1): 3→2,2→1,3→1? no;
    (2,1,3): 2→1,1→3,2→3? no. → 1.
    Cyclic (a→b,b→c,c→a, a=min): (1,3,2): 1→3,3→2,2→1 ✓ → 1."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 2)], "src long, dst long"
    )
    out = {r["pattern"]: r["cnt"] for r in triad_census(edges).collect()}
    assert out == {
        "mutual_dyads": 1,
        "asym_dyads": 2,
        "transitive_triads": 1,
        "cyclic_triads": 1,
    }


def test_triad_census_ignores_self_loops_and_dups(spark):
    edges = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    out = {r["pattern"]: r["cnt"] for r in triad_census(edges).collect()}
    assert out["mutual_dyads"] == 0
    assert out["asym_dyads"] == 3
    assert out["transitive_triads"] == 1  # 1→2, 2→3, 1→3
    assert out["cyclic_triads"] == 0


# ---------------------------------------------------------------- fusion
def test_ordinal_rank_matches_row_number(spark):
    """Histogram-prefix rank == naive global ROW_NUMBER (score DESC,
    id ASC), ties included."""
    rows = [(i, (i * 3) % 7) for i in range(50)]
    df = spark.createDataFrame(rows, "vid long, score long")
    got = {
        r["vid"]: r["r"]
        for r in ordinal_rank(df, "score", "vid", rank_col="r").collect()
    }
    want = {
        vid: rank + 1
        for rank, (vid, _) in enumerate(
            sorted(rows, key=lambda t: (-t[1], t[0]))
        )
    }
    assert got == want


def test_rrf_fuse_hand_oracle(spark):
    """Two 3-item lists: A ranks x,y,z; B ranks z,y (x absent from B).
    k=60, scale 1e9:
    x: 10^9//61 = 16393442
    y: 10^9//62 + 10^9//62 = 32258064
    z: 10^9//63 + 10^9//61 = 32264825
    Order: z, y, x."""
    a = spark.createDataFrame(
        [("x", 30), ("y", 20), ("z", 10)], "vid string, score long"
    )
    b = spark.createDataFrame([("z", 9), ("y", 5)], "vid string, score long")
    out = rrf_fuse({"a": a, "b": b}, top=3).collect()
    assert [r["vid"] for r in out] == ["z", "y", "x"]
    assert out[0]["rrf_fx"] == 10**9 // 63 + 10**9 // 61
    assert out[2]["rrf_fx"] == 10**9 // 61


# ---------------------------------------------------------------- BPE
def test_bpe_merge_pairs_hand_oracle(spark):
    """Docs: 'aba ab' ×1 → tokens aba(1), ab(1); pairs: aba→{ab,ba},
    ab→{ab} ⇒ ab:2, ba:1. Single-char tokens are skipped."""
    docs = spark.createDataFrame(
        [(1, "aba ab"), (2, "x y")], "doc_id long, text string"
    )
    out = {r["pair"]: r["cnt"] for r in bpe_merge_pairs(docs, k=10).collect()}
    assert out == {"ab": 2, "ba": 1}


def test_new_ops_plans_are_jvm_only(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    docs = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
    a = spark.createDataFrame([("x", 3)], "vid string, score long")
    for df in (
        wl_refinement(edges, rounds=2),
        rrf_fuse({"a": a}, top=5),
        bpe_merge_pairs(docs, k=5),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_host_fingerprints_mirror_detection(spark):
    """Two 'hosts' (v%199) with isomorphic internal structure share a
    fingerprint; a structurally different host does not. Host 1:
    {1, 200} path; host 2: {2, 201} path (isomorphic to host 1);
    host 3: {3, 202, 401} path of 3 (different)."""
    from drone_spark.algorithms.wl import wl_refinement
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(1, 200), (2, 201), (3, 202), (202, 401)], "src long, dst long"
    )
    colors = wl_refinement(edges, rounds=3)
    fps = {
        r["host"]: r["fingerprint"]
        for r in colors.withColumn("host", F.col("vid") % 199)
        .groupBy("host")
        .agg(
            F.md5(
                F.concat_ws(",", F.array_sort(F.collect_list("color")))
            ).alias("fingerprint")
        )
        .collect()
    }
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]
