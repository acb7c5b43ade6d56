"""ACL sweep cut + forest-fire sampling — hand barbell oracle and a
hashlib Python replica of the burn process."""

import hashlib

from pyspark.sql import functions as F

from drone_spark.algorithms.forestfire import forest_fire
from drone_spark.algorithms.sweep import sweep_cut


def test_sweep_cut_barbell(spark):
    """Barbell: triangles {1,2,3} and {4,5,6} bridged by 3-4. Scores
    rank 1,2,3 first — the sweep must bottom out at k=3 (the bridge
    cut): cut=1, vol=7, cond = 10^6 DIV 7 = 142857."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6)],
        "src long, dst long",
    )
    scores = spark.createDataFrame(
        [(1, 200), (2, 200), (3, 300), (4, 30), (5, 20), (6, 20)],
        "vid long, score_fx long",
    )
    rows = {r["k"]: r for r in sweep_cut(scores, edges).collect()}
    assert len(rows) == 5  # k = 1..5
    assert rows[1]["cut_edges"] == 2 and rows[1]["vol"] == 2
    assert rows[3]["cut_edges"] == 1 and rows[3]["vol"] == 7
    assert rows[3]["cond_ppm"] == 10**6 // 7
    assert min(rows.values(), key=lambda r: r["cond_ppm"])["k"] == 3


def test_sweep_conductance_bounds(spark):
    """0 < cond_ppm <= 2*10^6-ish on a connected graph; cut at k=n-1
    equals the degree of the last-ranked vertex."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "src long, dst long"
    )
    scores = spark.createDataFrame(
        [(i, 100 - i) for i in range(1, 9)], "vid long, score_fx long"
    )
    rows = sweep_cut(scores, edges).collect()
    for r in rows:
        assert r["cut_edges"] >= 1  # connected graph: every prefix has a cut
        assert r["cond_ppm"] >= 0


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_forest_fire_matches_python_replica(spark):
    """Path 0-1-...-9, seed {0}: replay the burn in pure Python with
    the same md5 parity coins and compare the growth curve."""
    n = 10
    pairs = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    burned = {0}
    waves = [{0}]
    for r in range(1, 4):
        new = set()
        for u in waves[-1]:
            for v in adj[u]:
                if v not in burned and _h60(f"ff{r}:{u}:{v}") & 1 == 0:
                    new.add(v)
        burned |= new
        waves.append(new)
    got = {r["round"]: (r["n_new"], r["n_total"]) for r in
           forest_fire(edges, rounds=3, seed_mod=9999).collect()}
    # seed_mod=9999 → only vertex 0 seeds (0 % anything == 0)
    total = 0
    for rnd, wave in enumerate(waves):
        total += len(wave)
        assert got[rnd] == (len(wave), total)


def test_forest_fire_monotone_and_bounded(spark):
    edges = spark.createDataFrame(
        [(i, (i * 7) % 50) for i in range(150) if i != (i * 7) % 50],
        "src long, dst long",
    )
    rows = sorted(forest_fire(edges, rounds=3, seed_mod=25).collect(),
                  key=lambda r: r["round"])
    totals = [r["n_total"] for r in rows]
    assert totals == sorted(totals)
    n_vertices = (
        edges.select("src").union(edges.select("dst")).distinct().count()
    )
    assert totals[-1] <= n_vertices
