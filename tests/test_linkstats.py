"""Link-graph statistics: clustering coefficient, Adamic-Adar,
reciprocity — exact small-graph oracles computed by hand."""

import math

import pytest
from pyspark.sql import functions as F

from drone_spark.algorithms.linkstats import (
    adamic_adar,
    clustering_coefficient,
    reciprocity,
    vertex_triangles,
)


@pytest.fixture(scope="module")
def kite(spark):
    """Kite graph: triangle {1,2,3} + triangle {2,3,4} sharing edge
    (2,3), plus pendant 5 hanging off 4. Degrees: 1:2, 2:3, 3:3, 4:3,
    5:1. Triangles per vertex: 1:1, 2:2, 3:2, 4:1, 5:0."""
    return spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5)], "src long, dst long"
    )


def test_vertex_triangles_credits_all_corners(spark, kite):
    t = {r["id"]: r["n_triangles"] for r in vertex_triangles(kite).collect()}
    assert t == {1: 1, 2: 2, 3: 2, 4: 1}  # 5 absent: no triangle


def test_clustering_coefficient_exact(spark, kite):
    cc = {r["vid"]: r for r in clustering_coefficient(kite).collect()}
    assert set(cc) == {1, 2, 3, 4, 5}
    assert cc[1]["cc"] == 1.0  # deg 2, 1 triangle: 2*1/(2*1)
    assert cc[2]["cc"] == pytest.approx(2 * 2 / (3 * 2))  # 2 triangles, deg 3
    assert cc[3]["cc"] == pytest.approx(2 * 2 / (3 * 2))
    assert cc[4]["cc"] == pytest.approx(2 * 1 / (3 * 2))
    assert cc[5]["cc"] == 0.0 and cc[5]["deg"] == 1  # deg<2 convention
    assert cc[2]["n_triangles"] == 2 and cc[5]["n_triangles"] == 0


def test_clustering_coefficient_input_orientation_invariant(spark, kite):
    """Directed duplicates / reversed edges must not change the
    undirected statistic."""
    doubled = kite.unionAll(
        kite.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    a = sorted(map(tuple, clustering_coefficient(kite).collect()))
    b = sorted(map(tuple, clustering_coefficient(doubled).collect()))
    assert a == b


def test_adamic_adar_exact(spark, kite):
    """Hand oracle on the kite. Candidate non-edges:
    (1,4): common nbrs {2,3} (deg 3 each) -> 2/ln 3
    (1,5): none -> absent
    (2,5): common {4} (deg 3) -> 1/ln 3
    (3,5): common {4} -> 1/ln 3
    """
    rows = adamic_adar(kite, k=10, max_degree=256).collect()
    got = {(r["u"], r["w"]): r["aa_score"] for r in rows}
    assert set(got) == {(1, 4), (2, 5), (3, 5)}
    assert got[(1, 4)] == pytest.approx(round(2 / math.log(3), 6), abs=1e-9)
    assert got[(2, 5)] == pytest.approx(round(1 / math.log(3), 6), abs=1e-9)
    # ranking: (1,4) first (highest), then (2,5) before (3,5) by tiebreak
    assert [(r["u"], r["w"]) for r in rows] == [(1, 4), (2, 5), (3, 5)]


def test_adamic_adar_hub_cap_drops_contributions(spark, kite):
    # cap 2: only vertices of degree exactly 2 may act as the shared
    # neighbor — that's vertex 1 (nbrs 2,3), predicting only (2,3),
    # which is an existing edge and gets excluded -> empty
    assert adamic_adar(kite, k=10, max_degree=2).count() == 0
    # with exclusion off the (2,3) prediction through center 1 appears
    rows = adamic_adar(kite, k=10, max_degree=2, exclude_existing=False).collect()
    assert {(r["u"], r["w"]) for r in rows} == {(2, 3)}
    assert rows[0]["aa_score"] == pytest.approx(round(1 / math.log(2), 6), abs=1e-9)


def test_reciprocity_exact(spark):
    # directed: 1->2 and 2->1 mutual; 1->3 one-way; loop 4->4 ignored;
    # duplicate 1->2 deduped
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (4, 4), (1, 2)], "src long, dst long"
    )
    r = reciprocity(e).collect()[0]
    assert r["n_edges"] == 3 and r["n_reciprocal"] == 2
    assert r["reciprocity"] == pytest.approx(2 / 3)


def test_linkstats_no_python_eval(spark, kite):
    """All three ops are pure relational plans — no BatchEvalPython
    (row-at-a-time Python) anywhere."""
    for df in (
        clustering_coefficient(kite),
        adamic_adar(kite, k=5),
        reciprocity(kite),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan


def test_degree_correlation_matches_python(spark):
    from drone_spark.algorithms.linkstats import degree_correlation

    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 1), (1, 1), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    dedup = {(s, d) for s, d in edges if s != d}
    from collections import Counter

    outd = Counter(s for s, _ in dedup)
    ind = Counter(d for _, d in dedup)
    xs = [(outd[s], ind[d]) for s, d in dedup]
    want = (
        len(xs),
        sum(x for x, _ in xs),
        sum(y for _, y in xs),
        sum(x * y for x, y in xs),
        sum(x * x for x, _ in xs),
        sum(y * y for _, y in xs),
    )
    [row] = degree_correlation(df).collect()
    assert tuple(row) == want


def test_joint_degree_histogram_buckets(spark):
    from drone_spark.algorithms.linkstats import joint_degree_histogram

    # star: 0 -> 1..8 gives outdeg(0)=8 (bucket 3), indeg=1 (bucket 0)
    edges = [(0, i) for i in range(1, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r["x_bucket"], r["y_bucket"]): r["n_edges"]
           for r in joint_degree_histogram(df).collect()}
    assert got == {(3, 0): 8}


def test_modularity_exact_integer_decomposition(spark, kite):
    """Hand-computed Newman-Girvan Q on the kite with partition
    {1,2,3} | {4,5}: m=6, e_0=3 d_0=8, e_1=1 d_1=4 →
    q_num = 24·3−64 = 8 and 24·1−16 = 8, Q = 16/144 = 1/9."""
    from drone_spark.algorithms.linkstats import modularity, modularity_q

    asg = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 1), (5, 1)], "vid long, community long"
    )
    rows = {r["community"]: r for r in modularity(kite, asg).collect()}
    assert (rows[0]["internal_edges"], rows[0]["degree_sum"],
            rows[0]["q_num"]) == (3, 8, 8)
    assert (rows[1]["internal_edges"], rows[1]["degree_sum"],
            rows[1]["q_num"]) == (1, 4, 8)
    assert abs(modularity_q(kite, asg) - 1.0 / 9.0) < 1e-12


def test_modularity_orientation_invariant(spark, kite):
    """Reversed/duplicated directed edges describe the same undirected
    graph — the decomposition must not change."""
    from drone_spark.algorithms.linkstats import modularity

    asg = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 1), (5, 1)], "vid long, community long"
    )
    rev = kite.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    both = kite.unionAll(rev).unionAll(kite)
    a = sorted(map(tuple, modularity(kite, asg).collect()))
    b = sorted(map(tuple, modularity(both, asg).collect()))
    assert a == b


def test_cocitation_exact(spark):
    """Sources 10,11 → {1,2}; 12 → {1,3}. In-degrees 1:3, 2:2, 3:1.
    Only (1,2) shares ≥2 in-linkers: common=2, jaccard 2/3 → 666666."""
    from drone_spark.algorithms.linkstats import cocitation

    e = spark.createDataFrame(
        [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 3)],
        "src long, dst long",
    )
    got = [tuple(r) for r in cocitation(e, min_common=2,
                                        max_out_degree=None).collect()]
    assert got == [(1, 2, 2, 666666)]
    loose = {(r["a"], r["b"]): (r["common"], r["jaccard_ppm"])
             for r in cocitation(e, min_common=1,
                                 max_out_degree=None).collect()}
    assert loose[(1, 3)] == (1, 333333)  # 1/(3+1-1)


def test_cocitation_hub_cap_drops_fat_sources(spark):
    from drone_spark.algorithms.linkstats import cocitation

    e = spark.createDataFrame(
        [(10, 1), (10, 2), (11, 1), (11, 2)], "src long, dst long"
    )
    # every source has out-degree 2 > cap 1 → no candidates at all
    assert cocitation(e, min_common=1, max_out_degree=1).count() == 0
    # cap above the fan-out keeps exact semantics
    kept = [tuple(r) for r in cocitation(e, min_common=2,
                                         max_out_degree=2).collect()]
    assert kept == [(1, 2, 2, 1000000)]


def test_louvain_sweep_singleton_start(spark, kite):
    """Hand-computed first sweep on the kite (m=6, 2m=12, score of
    moving v to singleton {u} = 12 − d_v·d_u, stay = 0):
    1→{2} (6, tie with {3} → min id), 2→{1} (6), 3→{1} (6),
    4→{5} (9 beats 3), 5→{4} (9)."""
    from drone_spark.algorithms.linkstats import louvain_sweep

    got = {r["vid"]: r["community"]
           for r in louvain_sweep(kite).collect()}
    assert got == {1: 2, 2: 1, 3: 1, 4: 5, 5: 4}


def test_louvain_sweep_seeded_fixed_point(spark, kite):
    """The natural kite partition {1,2,3}|{4,5} is modularity-locally
    optimal: every vertex's stay score beats all moves (hand-checked:
    v4 stay 9 vs move 0; v2 stay 6 vs 0), so the sweep is the
    identity on it."""
    from drone_spark.algorithms.linkstats import louvain_sweep

    seed = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 1), (5, 1)], "vid long, community long"
    )
    got = {r["vid"]: r["community"]
           for r in louvain_sweep(kite, seed).collect()}
    assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 1}


def test_louvain_sweep_repairs_misplaced_vertex(spark):
    """Two 4-cliques {0..3}, {10..13} bridged by (3,10), seeded with
    vertex 12 misplaced into the left community: the sweep moves
    EXACTLY 12 back (hand-checked: its move score 48 vs stay −39;
    every other vertex's stay dominates) and Q strictly improves."""
    from drone_spark.algorithms.linkstats import louvain_sweep, modularity_q

    cl = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    cl = cl + [(a + 10, b + 10) for a, b in cl] + [(3, 10)]
    edges = spark.createDataFrame(cl, "src long, dst long")
    seed = spark.createDataFrame(
        [(v, 0 if v < 10 or v == 12 else 1) for v in
         [0, 1, 2, 3, 10, 11, 12, 13]],
        "vid long, community long",
    )
    got = {r["vid"]: r["community"]
           for r in louvain_sweep(edges, seed).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 10: 1, 11: 1, 12: 1, 13: 1}
    out = spark.createDataFrame(list(got.items()), "vid long, community long")
    assert modularity_q(edges, out) > modularity_q(edges, seed)


def test_weighted_modularity_and_louvain(spark):
    """Weighted kite: edge (2,3) carries weight 10, all others 1 —
    W = 15. Partition {1,2,3}|{4,5}: w_0 = 1+1+10 = 12, s_0 = 2+
    (1+1+10)+(1+10+1) = 26, q_num_0 = 4·15·12 − 26² = 44;
    w_1 = 1, s_1 = (1+1+1)+1 = 4, q_num_1 = 60 − 16 = 44.
    And the weighted sweep must treat the heavy edge as gravity:
    singleton start moves 2 and 3 into each other (2m·10 = 300 ≫
    d2·d3 = 144), symmetric swap 2↔3."""
    from drone_spark.algorithms.linkstats import louvain_sweep, modularity

    kite_w = spark.createDataFrame(
        [(1, 2, 1), (1, 3, 1), (2, 3, 10), (2, 4, 1), (3, 4, 1), (4, 5, 1)],
        "src long, dst long, w long",
    )
    asg = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 1), (5, 1)], "vid long, community long"
    )
    rows = {r["community"]: tuple(r)[1:]
            for r in modularity(kite_w, asg, weight_col="w").collect()}
    assert rows[0] == (12, 26, 44)
    assert rows[1] == (1, 4, 44)
    got = {r["vid"]: r["community"]
           for r in louvain_sweep(kite_w, weight_col="w").collect()}
    assert got[2] == 3 and got[3] == 2  # the heavy edge wins for both
    # weight 1 everywhere ≡ the unweighted op (same integers)
    kite1 = kite_w.select("src", "dst", F.lit(1).alias("one"))
    a = sorted(map(tuple, modularity(kite1, asg, weight_col="one").collect()))
    b = sorted(map(tuple, modularity(kite1, asg).collect()))
    assert a == b


def test_bibliographic_coupling_is_cocitation_transpose(spark):
    """Sources 1,2 → {10,11}; 3 → {10,12}: coupling(1,2) shares 2
    targets, jaccard 2/(2+2-2)=1.0; and the op equals cocitation on
    reversed edges by construction."""
    from drone_spark.algorithms.linkstats import (
        bibliographic_coupling,
        cocitation,
    )

    e = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10), (3, 12)],
        "src long, dst long",
    )
    got = [tuple(r) for r in bibliographic_coupling(
        e, min_common=2, max_in_degree=None).collect()]
    assert got == [(1, 2, 2, 1000000)]
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    assert got == [tuple(r) for r in cocitation(
        rev, min_common=2, max_out_degree=None).collect()]


# ----------------------------------------------------- temporal reach
def test_temporal_reach_hand_case(spark):
    """1→2 (t=5), 2→3 (t=3): chronologically impossible — 3 is NOT
    reachable from 1. With 2→4 (t=7) it is. 2 reaches {3,4}."""
    from drone_spark.algorithms.linkstats import temporal_reach

    e = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 3), (2, 4, 7)], "src long, dst long, ts long"
    )
    got = {r["src"]: r["n_reached"] for r in temporal_reach(e, hops=3).collect()}
    assert got == {1: 2, 2: 2}  # 1 reaches {2,4}; 2 reaches {3,4}


def test_temporal_reach_equal_ts_allowed(spark):
    """Non-decreasing, not strictly increasing: equal timestamps relay."""
    from drone_spark.algorithms.linkstats import temporal_reach

    e = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 5)], "src long, dst long, ts long"
    )
    got = {r["src"]: r["n_reached"] for r in temporal_reach(e, hops=2).collect()}
    assert got == {1: 2, 2: 1}


def test_temporal_reach_earliest_arrival_dominates(spark):
    """Two routes into 3 (arrivals 9 and 2); only the EARLY one can
    extend over 3→4 (t=4). A last-arrival formulation would miss 4."""
    from drone_spark.algorithms.linkstats import temporal_reach

    e = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 2), (1, 3, 9), (3, 4, 4)],
        "src long, dst long, ts long",
    )
    got = {r["src"]: r["n_reached"] for r in temporal_reach(e, hops=3).collect()}
    assert got[1] == 3  # {2, 3, 4}


def test_temporal_reach_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    from drone_spark.algorithms.linkstats import (
        temporal_reach, temporal_reach_sql,
    )

    rows = [
        (1, 2, 5), (2, 3, 3), (2, 4, 7), (4, 5, 8), (5, 1, 9),
        (3, 1, 10), (1, 3, 1), (3, 4, 2),
    ]
    e = spark.createDataFrame(rows, "src long, dst long, ts long")
    got = sorted(tuple(r) for r in temporal_reach(e, hops=3).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE base (src BIGINT, dst BIGINT, ts BIGINT)")
    con.executemany("INSERT INTO base VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            temporal_reach_sql(
                "edges AS (SELECT src, dst, ts FROM base)", hops=3
            )
        ).fetchall()
    )
    assert got == want


# --------------------------------------------------------- butterflies
def test_butterflies_hand_case(spark):
    """K_{2,2} on orders {1,2} × parts {10,11} is exactly one
    butterfly (each part gets 1); part 12 hangs off order 1 only and
    closes nothing."""
    from drone_spark.algorithms.linkstats import butterflies

    e = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11), (1, 12)],
        "src long, dst long",
    )
    got = {r["vid"]: r["n_butterflies"] for r in butterflies(e).collect()}
    assert got == {10: 1, 11: 1}


def test_butterflies_choose_two(spark):
    """Three orders sharing the same two parts: C(3,2)=3 butterflies."""
    from drone_spark.algorithms.linkstats import butterflies

    e = spark.createDataFrame(
        [(o, p) for o in (1, 2, 3) for p in (10, 11)],
        "src long, dst long",
    )
    got = {r["vid"]: r["n_butterflies"] for r in butterflies(e).collect()}
    assert got == {10: 3, 11: 3}


def test_butterflies_left_degree_cap(spark):
    """An order with degree above the cap generates no wedges."""
    from drone_spark.algorithms.linkstats import butterflies

    e = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11)],
        "src long, dst long",
    )
    got = butterflies(e, max_left_degree=2).collect()
    assert got == []  # order 1 capped out; order 2 alone closes nothing


def test_butterflies_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    from drone_spark.algorithms.linkstats import butterflies, butterflies_sql

    rows = [(o, 10 + (o * 7 + j) % 5) for o in range(1, 9) for j in range(3)]
    e = spark.createDataFrame(rows, "src long, dst long")
    got = [tuple(r) for r in butterflies(e, k=10).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE base (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO base VALUES (?, ?)", rows)
    want = [
        tuple(r)
        for r in con.execute(
            butterflies_sql("edges AS (SELECT src, dst FROM base)", k=10)
        ).fetchall()
    ]
    assert got == want
