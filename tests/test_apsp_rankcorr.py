"""Exact APSP histogram + Spearman rank correlation invariants."""

import pytest
from pyspark.sql import functions as F

from drone_spark.algorithms.centrality import apsp_histogram
from drone_spark.ops.fusion import ordinal_rank


def test_apsp_path_graph(spark):
    """Directed path 1→2→3→4: dist 1 → 3 pairs, 2 → 2, 3 → 1."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    out = {r["dist"]: r["n_pairs"] for r in apsp_histogram(edges).collect()}
    assert out == {1: 3, 2: 2, 3: 1}


def test_apsp_cycle_counts(spark):
    """Directed 4-cycle: from each vertex, one vertex at each of
    dist 1, 2, 3 → n_pairs = 4 at every distance."""
    edges = spark.createDataFrame(
        [(i, i % 4 + 1) for i in range(1, 5)], "src long, dst long"
    )
    out = {r["dist"]: r["n_pairs"] for r in apsp_histogram(edges).collect()}
    assert out == {1: 4, 2: 4, 3: 4}


def _spearman_ppm(pairs):
    """Python replica: ranks by (score desc, id asc), long-division ppm."""
    n = len(pairs)
    r1 = {v: i + 1 for i, (v, _, _) in enumerate(
        sorted(pairs, key=lambda t: (-t[1], t[0])))}
    r2 = {v: i + 1 for i, (v, _, _) in enumerate(
        sorted(pairs, key=lambda t: (-t[2], t[0])))}
    sumd2 = sum((r1[v] - r2[v]) ** 2 for v, _, _ in pairs)
    a, denom = 6 * sumd2, n * n * n - n
    q = a // denom
    return 1_000_000 - (q * 1_000_000 + ((a - q * denom) * 1_000_000) // denom)


def test_spearman_identical_and_reversed(spark):
    """The ordinal-rank + long-division pipeline reproduces ρ = 1 for
    identical rankings and ρ = −1 for reversed ones (up to the floor:
    exactly ±10^6 since both are exact)."""
    rows = [(i, 100 - i, 100 - i) for i in range(1, 21)]
    assert _spearman_ppm(rows) == 1_000_000
    rev = [(i, 100 - i, i) for i in range(1, 21)]
    # reversed permutation: Σd² = n(n²−1)/3 ⇒ ρ = −1 exactly
    assert _spearman_ppm(rev) == -1_000_000


def test_ordinal_rank_is_permutation(spark):
    df = spark.createDataFrame(
        [(i, (i * 13) % 5) for i in range(40)], "vid long, score long"
    )
    ranks = [r["r"] for r in
             ordinal_rank(df, "score", "vid", rank_col="r").collect()]
    assert sorted(ranks) == list(range(1, 41))
