"""Landmark closeness centrality vs a Python BFS oracle."""

import hashlib
from collections import deque

from drone_spark.algorithms.centrality import (
    closeness_centrality, landmark_distances,
)


def _bfs(adj, src, max_dist):
    dist = {src: 0}
    q = deque([src])
    while q:
        v = q.popleft()
        if dist[v] >= max_dist:
            continue
        for w in adj.get(v, ()):
            if w not in dist:
                dist[w] = dist[v] + 1
                q.append(w)
    return dist


def _oracle(edges, n_landmarks, max_dist):
    verts = sorted({v for e in edges for v in e})
    lms = sorted(verts, key=lambda v: hashlib.md5(str(v).encode()).hexdigest())[
        :n_landmarks
    ]
    adj = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
    out = {}
    for lm in lms:
        for v, d in _bfs(adj, lm, max_dist).items():
            n, s = out.get(v, (0, 0))
            out[v] = (n + 1, s + d)
    return out


def test_landmark_distances_exact(spark, engine):
    import random

    rng = random.Random(7)
    edges = sorted({(rng.randrange(60), rng.randrange(60)) for _ in range(120)})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["vid"]: (r["n_reached"], r["sum_dist"])
        for r in closeness_centrality(
            spark, engine, df, n_landmarks=4, max_dist=64, run_id="close_t",
            num_parts=4,
        ).collect()
    }
    assert got == _oracle(edges, 4, 64)


def test_distance_distribution_matches_oracle(spark, engine):
    import random
    from collections import Counter

    from drone_spark.algorithms.centrality import distance_distribution

    rng = random.Random(11)
    edges = sorted({(rng.randrange(50), rng.randrange(50)) for _ in range(100)})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["dist"]: r["n_pairs"]
        for r in distance_distribution(
            spark, engine, df, n_landmarks=4, max_dist=64, run_id="dd_t",
            num_parts=4,
        ).collect()
    }
    want = Counter()
    verts = sorted({v for e in edges for v in e})
    lms = sorted(verts, key=lambda v: hashlib.md5(str(v).encode()).hexdigest())[:4]
    adj = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
    for lm in lms:
        for d in _bfs(adj, lm, 64).values():
            want[d] += 1
    assert got == dict(want)


def test_effective_diameter_integer_percentile():
    from drone_spark.algorithms.centrality import effective_diameter

    rows = [
        {"dist": 0, "n_pairs": 5},
        {"dist": 1, "n_pairs": 4},
        {"dist": 2, "n_pairs": 1},
    ]
    # cum at d=1 is 9/10 -> exactly 90%: integer compare keeps d=1
    assert effective_diameter(rows) == 1
    assert effective_diameter(rows, pct_num=1, pct_den=2) == 0
    assert effective_diameter([]) == 0


def test_distance_bound_respected(spark, engine):
    # path 0 -> 1 -> 2 -> 3 -> 4; landmark set = all 5, max_dist = 2
    edges = [(i, i + 1) for i in range(4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    run = landmark_distances(
        spark, engine, df, n_landmarks=5, max_dist=2, run_id="close_b",
        num_parts=2,
    )
    dists = [(r["lm"], r["vid"], r["dist"]) for r in run.state.collect()]
    assert max(d for _, _, d in dists) <= 2
    # from landmark 0 exactly vertices 0,1,2 are within 2 hops
    from0 = {v: d for lm, v, d in dists if lm == 0}
    assert from0 == {0: 0, 1: 1, 2: 2}


def test_harmonic_centrality_exact_quotients(spark, engine):
    """Path 0→1→2 with landmarks = all 3 md5-smallest vertices: v2 is
    reached by 0 at d=2 (500000) and 1 at d=1 (1000000) → 1500000;
    self rows excluded."""
    from drone_spark.algorithms.centrality import harmonic_centrality

    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {r["vid"]: (r["n_reached"], r["harmonic_ppm"])
           for r in harmonic_centrality(
               spark, engine, edges, n_landmarks=3, max_dist=8,
               run_id="harm_t").collect()}
    assert got == {1: (1, 1_000_000), 2: (2, 1_500_000)}


def test_landmark_eccentricity_exact(spark, engine):
    """All vertices as landmarks on 1→2→3→4 (+5→2): ecc from 1 is 3,
    from 5 is 3, from 2 is 2, 3 is 1, 4 is 0."""
    from drone_spark.algorithms.centrality import landmark_eccentricity

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 2)], "src long, dst long"
    )
    rows = {
        r["landmark"]: (r["ecc"], r["n_reached"], r["sum_dist"])
        for r in landmark_eccentricity(
            spark, engine, edges, n_landmarks=5, max_dist=10,
            run_id="t_ecc",
        ).collect()
    }
    # n_reached includes the self row at dist 0
    assert rows[1] == (3, 4, 6)   # 1:0, 2:1, 3:2, 4:3
    assert rows[5] == (3, 4, 6)
    assert rows[2] == (2, 3, 3)
    assert rows[3] == (1, 2, 1)
    assert rows[4] == (0, 1, 0)


def test_landmark_eccentricity_respects_max_dist(spark, engine):
    from drone_spark.algorithms.centrality import landmark_eccentricity

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    rows = {
        r["landmark"]: r["ecc"]
        for r in landmark_eccentricity(
            spark, engine, edges, n_landmarks=4, max_dist=2,
            run_id="t_ecc2",
        ).collect()
    }
    assert rows[1] == 2  # bounded below true ecc 3
