"""Round-5 continuation ops, batch 8: host-local PR gap, stickiness,
hour×weekday profile — invariants on constructed inputs (the composed
queries themselves are driver-gated against DuckDB oracles)."""

import datetime

from pyspark.sql import functions as F

import __spark_entry__ as entry


def test_host_local_pr_gap_zero_when_graph_is_intra_host(spark, tmp_path):
    """If EVERY edge is intra-host, local PR == global PR, so every
    host's gap is 0. Build a tiny parquet sf-dir whose lineitem yields
    only same-host bipartite edges: host(src)=src%199,
    host(dst)=(1e7+part)%199 — choose orderkey ≡ (1e7+partkey) mod
    199."""
    rows = []
    for i in range(40):
        part = i + 1
        order = (10_000_000 + part) % 199 + 199 * (i + 3)
        rows.append((order, part))
    li = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    )
    sf = str(tmp_path / "sf")
    li.write.parquet(f"{sf}/lineitem.parquet")
    out = entry.q_host_local_pr_gap(spark, sf).collect()
    assert len(out) > 0
    assert all(r["l1_fx"] == 0 and r["gap_ppm"] == 0 for r in out)


def test_stickiness_single_user_daily(spark, tmp_path):
    """One user active 3 days in one 30-day block: MAU=1, DAU=1 →
    stickiness 1e6 each day; a second user active day 0 only halves
    day 1-2 stickiness."""
    rows = [
        (0, 1, datetime.datetime(2024, 1, 1), "view", 0.0),
        (1, 1, datetime.datetime(2024, 1, 2), "view", 0.0),
        (2, 1, datetime.datetime(2024, 1, 3), "view", 0.0),
        (3, 2, datetime.datetime(2024, 1, 1), "view", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )
    sf = str(tmp_path / "sf")
    ev.write.parquet(f"{sf}/events.parquet")
    out = {r["day"]: (r["dau"], r["mau"], r["stickiness_ppm"])
           for r in entry.q_stickiness(spark, sf).collect()}
    days = sorted(out)
    assert out[days[0]] == (2, 2, 1_000_000)
    assert out[days[1]] == (1, 2, 500_000)
    assert out[days[2]] == (1, 2, 500_000)


def test_hourweek_profile_uniform_is_1e6(spark, tmp_path):
    """Perfectly uniform traffic over a full week grid: every cell's
    independence deviation is exactly 10⁶ ppm."""
    rows, eid = [], 0
    t0 = datetime.datetime(2024, 1, 1)  # Monday
    for d in range(7):
        for h in range(24):
            rows.append((eid, 1, t0 + datetime.timedelta(days=d, hours=h),
                         "view", 0.0))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )
    sf = str(tmp_path / "sf")
    ev.write.parquet(f"{sf}/events.parquet")
    out = entry.q_hourweek_profile(spark, sf).collect()
    assert len(out) == 168
    assert all(r["dev_ppm"] == 1_000_000 and r["n"] == 1 for r in out)
