"""Catalog maintenance: expire_snapshots / vacuum (Iceberg
expire_snapshots / remove_orphan_files parity)."""

import os

import pytest

from drone_spark.catalog import Catalog


def _write_history(spark, cat):
    """v1 snapshot, v2 append, v3 snapshot, v4 append, v5 append."""
    df = lambda n: spark.range(n).selectExpr("id", "id * 2 AS x")  # noqa: E731
    cat.write_snapshot(df(3), "t")
    cat.append(df(2), "t")
    cat.write_snapshot(df(5), "t")
    cat.append(df(1), "t")
    cat.append(df(4), "t")


def test_expire_keeps_retained_versions_resolvable(spark, tmp_path):
    cat = Catalog(str(tmp_path / "c"))
    _write_history(spark, cat)
    before_v5 = sorted(r["id"] for r in cat.read(spark, "t").collect())
    before_v4 = sorted(r["id"] for r in cat.read(spark, "t", version=4).collect())

    expired = cat.expire_snapshots("t", keep_last=2)  # retain v4, v5
    # v4 resolves via snapshot v3 -> anchor pulls back to v3: only v1, v2 go
    assert expired == [1, 2]
    assert cat.versions("t") == [3, 4, 5]
    assert sorted(r["id"] for r in cat.read(spark, "t").collect()) == before_v5
    assert sorted(r["id"] for r in cat.read(spark, "t", version=4).collect()) == before_v4
    # time travel to an expired version raises (Iceberg parity)
    with pytest.raises(FileNotFoundError):
        cat.read(spark, "t", version=2)


def test_expire_noop_when_history_short(spark, tmp_path):
    cat = Catalog(str(tmp_path / "c"))
    cat.write_snapshot(spark.range(3), "t")
    assert cat.expire_snapshots("t", keep_last=2) == []
    assert cat.versions("t") == [1]


def test_expire_never_splits_a_resolution_chain(spark, tmp_path):
    """keep_last=1 with the newest commit an APPEND: the anchor snapshot
    and intermediate appends must survive too."""
    cat = Catalog(str(tmp_path / "c"))
    _write_history(spark, cat)
    expired = cat.expire_snapshots("t", keep_last=1)  # retain v5 -> anchor v3
    assert expired == [1, 2]
    assert cat.versions("t") == [3, 4, 5]
    assert cat.read(spark, "t").count() == 5 + 1 + 4


def test_vacuum_removes_orphans_not_live_data(spark, tmp_path):
    cat = Catalog(str(tmp_path / "c"))
    _write_history(spark, cat)
    cat.expire_snapshots("t", keep_last=2)
    tdir = os.path.join(str(tmp_path / "c"), "t")
    # plant crash debris + a stale dir that expiry already dropped from
    # the manifest but (simulating a crash mid-expire) still exists
    os.makedirs(os.path.join(tdir, ".tmp-deadbeef"))
    os.makedirs(os.path.join(tdir, "v=000099"))
    before = sorted(r["id"] for r in cat.read(spark, "t").collect())
    removed = cat.vacuum("t")
    assert removed == [".tmp-deadbeef", "v=000099"]
    assert sorted(r["id"] for r in cat.read(spark, "t").collect()) == before
    assert cat.vacuum("t") == []


def test_merge_upsert_semantics(spark, tmp_path):
    from drone_spark.catalog import StatsCatalog

    cat = StatsCatalog(str(tmp_path / "c"))
    cat.write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string"),
        "t",
    )
    cat.merge_upsert(
        spark.createDataFrame([(2, "B"), (4, "d")], "k long, v string"), "t", "k"
    )
    got = {r["k"]: r["v"] for r in cat.read(spark, "t").collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}
    # merge on an empty table = plain insert
    cat2 = StatsCatalog(str(tmp_path / "c2"))
    cat2.merge_upsert(spark.createDataFrame([(9, "z")], "k long, v string"), "t", "k")
    assert cat2.read(spark, "t").count() == 1


def test_scan_plan_prunes_by_column_stats(spark, tmp_path):
    from drone_spark.catalog import StatsCatalog

    cat = StatsCatalog(str(tmp_path / "c"))
    cat.write_snapshot(spark.range(0, 100), "t")          # v1: id 0..99
    cat.append(spark.range(100, 200), "t")                # v2: id 100..199
    cat.append(spark.range(500, 600), "t")                # v3: id 500..599
    assert cat.scan_plan("t", "id", 150, 160) == [2]
    assert cat.scan_plan("t", "id", 90, 110) == [1, 2]
    assert cat.scan_plan("t", "id", 900, 999) == []
    # stats survive the manifest round-trip
    assert cat.commit_meta("t", 3)["stats"]["id"] == [500, 599]
    # a plain Catalog commit (no stats) is conservatively kept
    from drone_spark.catalog import Catalog

    Catalog(str(tmp_path / "c")).append(spark.range(5), "t")  # v4, statless
    assert cat.scan_plan("t", "id", 900, 999) == [4]
