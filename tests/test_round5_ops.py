"""Round-5 operators: Katz centrality, link prediction, partition
quality, 2-step reachability, hour-over-hour trending, URL depth —
exact small-graph oracles computed by hand, plus plan pins (every one
of these is a pure-JVM relational plan except Katz's engine loop)."""

import datetime

import pytest
from pyspark.sql import functions as F

from drone_spark.algorithms.linkstats import link_prediction, path2_reach
from drone_spark.extraction import url_depth_stats
from drone_spark.graph.quality import partition_quality
from drone_spark.ops.events import trending


@pytest.fixture(scope="module")
def kite(spark):
    """Kite: triangles {1,2,3} and {2,3,4} sharing (2,3), pendant 5 on
    4. Sym degrees: 1:2, 2:3, 3:3, 4:3, 5:1."""
    return spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5)], "src long, dst long"
    )


# ---------------------------------------------------------------- katz
def test_katz_fixed_hand_oracle(spark, engine):
    """Path graph 1→2→3, α=1/2 (num=1, den=2), β=1, scale 10⁹.
    k1: x(1)=S, x(2)=S+S//2=1.5S, x(3)=S+S//2=1.5S
    k2: x(3)=S + (1.5S)//2 = 1.75S; x(2)=1.5S; x(1)=S
    """
    from drone_spark.algorithms.centrality import KATZ_SCALE, katz_fixed

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = {
        r["vid"]: r["katz_fx"]
        for r in katz_fixed(
            spark, engine, edges, iters=2, alpha_num=1, alpha_den=2,
            run_id="t_katz",
        ).collect()
    }
    s = KATZ_SCALE
    assert out == {1: s, 2: s + s // 2, 3: s + (s + s // 2) // 2}


def test_katz_sql_twin_matches_spark(spark, engine):
    """The DuckDB twin replays the exact integer recurrence."""
    duckdb = pytest.importorskip("duckdb")
    from drone_spark.algorithms.centrality import katz_fixed, katz_fixed_sql

    rows = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {
        r["vid"]: r["katz_fx"]
        for r in katz_fixed(spark, engine, edges, iters=4, run_id="t_katz2").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE base (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO base VALUES (?, ?)", rows)
    sql = "WITH " + katz_fixed_sql(
        "edges AS (SELECT src, dst FROM base)", iters=4
    ).removeprefix("WITH ")
    want = dict(con.execute(sql).fetchall())
    assert got == want


# ----------------------------------------------------- link prediction
def test_link_prediction_hand_oracle(spark, kite):
    """Unlinked pairs with shared neighbors on the kite:
    (1,4): common {2,3}, deg1=2 deg4=3, union=2+3-2=3 → jacc 666666;
           ra = 10⁶//3 + 10⁶//3 = 666666; pa = 6
    (2,5): common {4} → jacc 10⁶//(3+1-1)=333333, ra 333333, pa 3
    (3,5): same as (2,5)
    """
    rows = {(r["u"], r["w"]): r for r in link_prediction(kite, k=10).collect()}
    assert set(rows) == {(1, 4), (2, 5), (3, 5)}
    r14 = rows[(1, 4)]
    assert (r14["common"], r14["jaccard_ppm"], r14["ra_ppm"], r14["pref_attach"]) == (
        2, 666666, 666666, 6,
    )
    r25 = rows[(2, 5)]
    assert (r25["common"], r25["jaccard_ppm"], r25["ra_ppm"], r25["pref_attach"]) == (
        1, 333333, 333333, 3,
    )


def test_link_prediction_hub_cap_prunes_generation_only(spark):
    """Star 0-{1..5} plus edge (1,2): with the cap below the hub's
    degree, pairs through the hub vanish; pair (1,2) is an existing
    edge so nothing survives. True degrees still feed pa/jaccard when
    the cap admits the center."""
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(1, 2)], "src long, dst long"
    )
    assert link_prediction(star, k=10, max_degree=4).count() == 0
    # cap admits hub (deg 5 ≤ 8): leaf pairs (i,j) via hub, ra=10⁶//5
    out = {(r["u"], r["w"]): r for r in link_prediction(star, k=100, max_degree=8).collect()}
    assert (3, 4) in out and out[(3, 4)]["ra_ppm"] == 200000
    assert out[(3, 4)]["pref_attach"] == 1
    assert (1, 2) not in out  # existing edge excluded


# --------------------------------------------------- partition quality
def test_partition_quality_hand_oracle(spark, kite):
    """Buckets mod 2 on the kite (vertices 1..5):
    bucket 1 = {1,3,5}: vol 2+3+1=6; internal (1,3): 1; cut (1,2),(2,3),(3,4),(4,5): 4
    bucket 0 = {2,4}:   vol 3+3=6;   internal (2,4): 1; cut same 4 edges: 4
    total_vol = 12, denom = min(6,6)=6 → conductance 666666 both."""
    out = {r["bucket"]: r for r in partition_quality(kite, num_buckets=2).collect()}
    assert out[0]["n_vertices"] == 2 and out[1]["n_vertices"] == 3
    for b in (0, 1):
        assert out[b]["volume"] == 6
        assert out[b]["internal_edges"] == 1
        assert out[b]["cut_edges"] == 4
        assert out[b]["conductance_ppm"] == 666666


def test_partition_quality_custom_assignment(spark, kite):
    """A perfect 2-cut assignment ({1,2,3} | {4,5}) cuts only (2,4),
    (3,4): conductance 2/min(8,4)·10⁶ = 500000 for the small side."""
    assign = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 1), (5, 1)], "id long, bucket long"
    )
    out = {
        r["bucket"]: r
        for r in partition_quality(kite, assign=assign).collect()
    }
    assert out[0]["internal_edges"] == 3 and out[0]["cut_edges"] == 2
    assert out[1]["internal_edges"] == 1 and out[1]["cut_edges"] == 2
    assert out[1]["conductance_ppm"] == 500000  # 2·10⁶ // 4


# -------------------------------------------------------- path2_reach
def test_path2_reach_hand_oracle(spark):
    """Edges 1→2, 1→3, 2→4, 3→4, 4→1: paths of length 2:
    (1,4) via {2,3} = 2; (2,1) via 4; (3,1) via 4; (4,2),(4,3) via 1."""
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4), (4, 1)], "src long, dst long"
    )
    out = {(r["a"], r["b"]): r["n_paths"] for r in path2_reach(e, k=10).collect()}
    assert out == {(1, 4): 2, (2, 1): 1, (3, 1): 1, (4, 2): 1, (4, 3): 1}


def test_path2_reach_excludes_loops_and_caps_middles(spark):
    """a→m→a round trips are excluded; a hub middle above the cap
    contributes nothing."""
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 9), (9, 3), (9, 4)], "src long, dst long"
    )
    out = {(r["a"], r["b"]): r["n_paths"] for r in path2_reach(e, k=10).collect()}
    assert (1, 1) not in out and (2, 2) not in out
    assert out[(1, 3)] == 1 and out[(1, 4)] == 1  # via 9
    capped = {
        (r["a"], r["b"]): r["n_paths"]
        for r in path2_reach(e, k=10, max_degree=1).collect()
    }
    # middle 9 has outd 2 > 1 → its paths vanish; 1↔2 loops excluded
    assert (1, 3) not in capped and (1, 4) not in capped


# ----------------------------------------------------------- trending
def test_trending_hand_oracle(spark):
    """click: 2 events in hour H, 6 in H+1 (ratio 3×), gap, then 1 in
    H+3 (prev NULL — gap hour); view: below min_prev base."""
    h0 = datetime.datetime(2024, 1, 1, 10, 0, 0)

    def at(hours, minute):
        return h0 + datetime.timedelta(hours=hours, minutes=minute)

    rows = (
        [("click", at(0, m)) for m in (1, 2)]
        + [("click", at(1, m)) for m in range(6)]
        + [("click", at(3, 0))]
        + [("view", at(0, 0)), ("view", at(1, 0))]
    )
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {
        (r["event_type"], r["epoch_hour"]): r
        for r in trending(ev, min_prev=2).collect()
    }
    base = int(h0.replace(tzinfo=datetime.timezone.utc).timestamp()) // 3600
    r1 = out[("click", base + 1)]
    assert (r1["n_events"], r1["prev_n"], r1["trend_ppm"]) == (6, 2, 3000000)
    r3 = out[("click", base + 3)]
    assert r3["prev_n"] is None and r3["trend_ppm"] is None  # gap hour
    rv = out[("view", base + 1)]
    assert rv["prev_n"] == 1 and rv["trend_ppm"] is None  # base < min_prev


# ---------------------------------------------------------- url depth
def test_url_depth_hand_oracle(spark):
    urls = spark.createDataFrame(
        [
            ("http://a.example/x",),
            ("http://a.example/x/y/z",),
            ("http://b.example/",),
            ("http://c.example",),  # no path at all → depth 0
        ],
        "url string",
    )
    out = {r["host"]: r for r in url_depth_stats(urls).collect()}
    assert (out["a.example"]["n_urls"], out["a.example"]["sum_depth"],
            out["a.example"]["max_depth"], out["a.example"]["avg_depth_ppm"]) == (
        2, 4, 3, 2000000,
    )
    assert out["b.example"]["max_depth"] == 1
    assert out["c.example"]["sum_depth"] == 0


# ---------------------------------------------------------- plan pins
def test_round5_relational_ops_stay_jvm_side(spark, kite):
    """No Python eval anywhere in the round-5 relational plans."""
    plans = [
        link_prediction(kite, k=10)._jdf.queryExecution().executedPlan().toString(),
        path2_reach(kite, k=10)._jdf.queryExecution().executedPlan().toString(),
        partition_quality(kite)._jdf.queryExecution().executedPlan().toString(),
        url_depth_stats(
            kite.select(F.concat(F.lit("http://h/p"), F.col("src")).alias("url"))
        )._jdf.queryExecution().executedPlan().toString(),
    ]
    for plan in plans:
        for marker in ("BatchEvalPython", "ArrowEvalPython",
                       "FlatMapGroupsInPandas", "MapInPandas"):
            assert marker not in plan


# ---------------------------------------------------------- eigenvector
def test_eigenvector_fixed_hand_oracle(spark, engine):
    """Star 1→3, 2→3, 3→4 at scale 10⁶.
    r1: acc(3)=2S, acc(4)=S; max=2S → x = (S·acc)//max:
        x(3)=S, x(4)=S//2, x(1)=x(2)=0
    r2: acc(3)=0, acc(4)=x(3)=S; max=S → x(4)=S, rest 0.
    """
    from drone_spark.algorithms.centrality import EIG_SCALE, eigenvector_fixed

    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (3, 4)], "src long, dst long"
    )
    s = EIG_SCALE
    out1 = {
        r["vid"]: r["eig_fx"]
        for r in eigenvector_fixed(
            spark, engine, edges, iters=1, run_id="t_eig1"
        ).collect()
    }
    assert out1 == {1: 0, 2: 0, 3: s, 4: s // 2}
    out2 = {
        r["vid"]: r["eig_fx"]
        for r in eigenvector_fixed(
            spark, engine, edges, iters=2, run_id="t_eig2"
        ).collect()
    }
    assert out2 == {1: 0, 2: 0, 3: 0, 4: s}


def test_eigenvector_converges_to_principal_direction(spark, engine):
    """On a strongly-connected graph the max-normalized iterate tracks
    the NumPy principal eigenvector (scaled to max = 1) within the
    integer quantization error after enough rounds."""
    np = pytest.importorskip("numpy")
    from drone_spark.algorithms.centrality import EIG_SCALE, eigenvector_fixed

    rows = [(1, 2), (2, 3), (3, 1), (1, 3), (3, 2), (2, 1)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {
        r["vid"]: r["eig_fx"] / EIG_SCALE
        for r in eigenvector_fixed(
            spark, engine, edges, iters=25, run_id="t_eig3"
        ).collect()
    }
    ids = sorted(got)
    a = np.zeros((len(ids), len(ids)))
    idx = {v: i for i, v in enumerate(ids)}
    for u, w in rows:
        a[idx[w], idx[u]] = 1.0  # acc[v] = sum over in-edges
    x = np.ones(len(ids))
    for _ in range(200):
        x = a @ x
        x = x / x.max()
    for v in ids:
        assert abs(got[v] - x[idx[v]]) < 1e-4


def test_eigenvector_sql_twin_matches_spark(spark, engine):
    duckdb = pytest.importorskip("duckdb")
    from drone_spark.algorithms.centrality import (
        eigenvector_fixed, eigenvector_fixed_sql,
    )

    rows = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (5, 4)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {
        r["vid"]: r["eig_fx"]
        for r in eigenvector_fixed(
            spark, engine, edges, iters=4, run_id="t_eig4"
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE base (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO base VALUES (?, ?)", rows)
    sql = "WITH " + eigenvector_fixed_sql(
        "edges AS (SELECT src, dst FROM base)", iters=4
    ).removeprefix("WITH ")
    want = dict(con.execute(sql).fetchall())
    assert got == want


# ------------------------------------------------- community conductance
def test_community_conductance_hand_oracle(spark):
    """Kite with communities A = {1,2,3}, B = {4,5}. Undirected edges:
    (1,2),(1,3),(2,3),(2,4),(3,4),(4,5); 2|E| = 12.
    A: n=3, vol = 2+3+3 = 8, internal 3, cut 2 → ppm = 2e6//min(8,4)=500000
    B: n=2, vol = 3+1 = 4, internal 1, cut 2 → ppm = 2e6//4 = 500000
    """
    from drone_spark.graph.quality import community_conductance

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5)],
        "src long, dst long",
    )
    assign = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (4, "B"), (5, "B")],
        "id long, community string",
    )
    rows = {r["community"]: r for r in community_conductance(edges, assign).collect()}
    a, b = rows["A"], rows["B"]
    assert (a["n_vertices"], a["volume"], a["internal_edges"],
            a["cut_edges"], a["conductance_ppm"]) == (3, 8, 3, 2, 500000)
    assert (b["n_vertices"], b["volume"], b["internal_edges"],
            b["cut_edges"], b["conductance_ppm"]) == (2, 4, 1, 2, 500000)


def test_community_conductance_sql_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    from drone_spark.graph.quality import (
        community_conductance, community_conductance_sql,
    )

    rows = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 6), (6, 7)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    assign = spark.createDataFrame(
        [(i, f"c{i % 3}") for i in range(1, 8)], "id long, community string"
    )
    got = sorted(
        tuple(r) for r in community_conductance(edges, assign).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE base (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO base VALUES (?, ?)", rows)
    sql = community_conductance_sql(
        "edges AS (SELECT src, dst FROM base)",
        "v0 AS (SELECT DISTINCT id FROM (SELECT src AS id FROM edges"
        " UNION ALL SELECT dst AS id FROM edges)), "
        "assign AS (SELECT id, 'c' || CAST(id % 3 AS VARCHAR)"
        " AS community FROM v0)",
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want
