"""FIXTURES.md F3: DRONE text-format parity — read the reference's file
formats, run our algorithms, match brute-force oracles on the same graph."""

import numpy as np
import pytest

from drone_spark.algorithms.cc import connected_components
from drone_spark.algorithms.pagerank import pagerank
from drone_spark.sources.drone_format import (
    read_degrees, read_edge_list, read_masters, read_mirrors, synth_attr,
)
from tests.oracles import numpy_pagerank, union_find_components

# ~20-vertex, 2-partition directed graph in the reference's own formats
G0 = """1 2
2 3
3 1
4 5
5 6
10 11
"""
G1 = """6 4
11 12
12 10
7 8
8 9
9 7
13 7
"""
MASTER0 = "1 1\n4 1\n"          # vid mirrorWorker...
MASTER1 = "7 0\n"
MIRROR0 = "7 1\n"               # vid masterWorker
MIRROR1 = "1 0\n4 0\n"
DEGREE0 = "1 1\n2 1\n3 1\n4 1\n5 1\n10 1\n"
DEGREE1 = "6 1\n11 1\n12 1\n7 1\n8 1\n9 1\n13 1\n"


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("drone_fmt")
    for name, content in [
        ("G.0", G0), ("G.1", G1), ("Master.0", MASTER0), ("Master.1", MASTER1),
        ("Mirror.0", MIRROR0), ("Mirror.1", MIRROR1),
        ("Degree.0", DEGREE0), ("Degree.1", DEGREE1),
    ]:
        (d / name).write_text(content)
    return str(d)


def test_edge_list_scan(spark, fixture_dir):
    edges = read_edge_list(spark, f"{fixture_dir}/G.*")
    assert edges.count() == 13
    assert edges.schema.simpleString() == "struct<src:bigint,dst:bigint>"


def test_replica_scans(spark, fixture_dir):
    masters = read_masters(spark, f"{fixture_dir}/Master.*")
    mirrors = read_mirrors(spark, f"{fixture_dir}/Mirror.*")
    m = {r["vid"]: r["mirror_workers"] for r in masters.collect()}
    assert m == {1: [1], 4: [1], 7: [0]}
    mm = {r["vid"]: r["master_worker"] for r in mirrors.collect()}
    assert mm == {7: 1, 1: 0, 4: 0}


def test_degree_scan_matches_derived(spark, fixture_dir):
    edges = read_edge_list(spark, f"{fixture_dir}/G.*")
    from drone_spark.graph.builder import out_degrees

    file_deg = {r["id"]: r["outdeg"] for r in read_degrees(spark, f"{fixture_dir}/Degree.*").collect()}
    derived = {r["id"]: r["outdeg"] for r in out_degrees(edges).collect()}
    assert file_deg == derived


def test_attr_synthesis(spark, fixture_dir):
    edges = read_edge_list(spark, f"{fixture_dir}/G.*")
    from drone_spark.graph.builder import vertices

    attrs = {r["id"]: r["attr"] for r in synth_attr(vertices(edges)).collect()}
    assert all(attrs[v] == v % 100 for v in attrs)


def test_algorithms_on_drone_format_graph(spark, engine, fixture_dir):
    edges = read_edge_list(spark, f"{fixture_dir}/G.*")
    epd = [(r["src"], r["dst"]) for r in edges.collect()]

    res = pagerank(spark, engine, edges, run_id="df_pr", tol=1e-8)
    got = {r["vid"]: r["pr"] for r in res.state.collect()}
    exp = numpy_pagerank(epd, tol=1e-8)
    assert max(abs(got[v] - exp[v]) for v in exp) < 1e-6

    cc = connected_components(spark, engine, edges, run_id="df_cc", backend="relational")
    got_cc = {r["vid"]: r["label"] for r in cc.state.collect()}
    assert got_cc == union_find_components(epd)


def test_read_isolated_wires_into_pagerank(spark, engine, tmp_path):
    # S4 (SURVEY §2.1): Isolateds.* vertices join the graph scope and
    # receive PageRank teleport mass 0.15 (dead code in the reference,
    # graph.go:443-457; live here via vertices(extra=...))
    from drone_spark.algorithms.pagerank import pagerank
    from drone_spark.sources.drone_format import read_isolated

    iso_dir = tmp_path / "iso"
    iso_dir.mkdir()
    (iso_dir / "Isolateds.0").write_text("41\n42\n")
    iso = read_isolated(spark, str(iso_dir / "Isolateds.*"))
    assert {r["id"] for r in iso.collect()} == {41, 42}
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    res = pagerank(
        spark, engine, edges, run_id="pr_iso_fmt", tol=1e-9, extra_vertices=iso
    )
    got = {r["vid"]: r["pr"] for r in res.state.collect()}
    assert abs(got[41] - 0.15) < 1e-9 and abs(got[42] - 0.15) < 1e-9
