"""Triangle count exactness vs brute force."""

from drone_spark.algorithms.triangles import triangle_count
from tests.oracles import brute_triangles


def test_known_tiny_graph(spark):
    # K4 has 4 triangles; extra pendant edge adds none
    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)] + [(3, 9)],
        "src long, dst long",
    )
    assert triangle_count(edges).collect()[0]["n_triangles"] == 4


def test_triangle_free(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    assert triangle_count(edges).collect()[0]["n_triangles"] == 0


def test_matches_bruteforce_on_corpus_graph(spark, small_edges, small_edges_pd):
    got = triangle_count(small_edges).collect()[0]["n_triangles"]
    exp = brute_triangles(list(small_edges_pd.itertuples(index=False, name=None)))
    assert got == exp


def test_direction_and_duplicates_ignored(spark):
    # same triangle given with mixed directions and duplicate edges
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3)], "src long, dst long"
    )
    assert triangle_count(edges).collect()[0]["n_triangles"] == 1
