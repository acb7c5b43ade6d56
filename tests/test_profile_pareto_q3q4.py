"""Round-5 continuation ops, batch 12: graph profile, Pareto shares,
TPC-H Q3/Q4 analogs — hand oracles / invariants."""

import datetime

from pyspark.sql import functions as F

import __spark_entry__ as entry
from drone_spark.algorithms.linkstats import graph_profile


def test_graph_profile_hand_oracle(spark):
    """Raw rows: 1→2 (dup), 2→3, 3→3 loop. Simple graph: {1→2, 2→3}.
    n=3, m=2, density = 2/6 ppb-floored, dmax=1."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 3), (3, 3)], "src long, dst long"
    )
    r = graph_profile(edges).collect()[0]
    assert r["n_vertices"] == 3
    assert r["n_edges_raw"] == 4
    assert r["n_edges"] == 2
    assert r["n_selfloops"] == 1
    assert r["density_ppb"] == (10**9 * 2) // 6
    assert r["max_out_deg"] == 1
    assert r["mean_out_deg_ppm"] == (10**6 * 2) // 3
    assert r["top_hub_share_ppm"] == 500_000


def test_pareto_shares_sum_to_one(spark, tmp_path):
    """Deciles partition the users; event shares sum to ≤1e6 and
    within rounding of 1e6; the top decile share dominates under a
    skewed load."""
    rows, eid = [], 0
    t0 = datetime.datetime(2024, 1, 1)
    for u in range(20):
        n = 100 if u == 0 else 5
        for i in range(n):
            rows.append((eid, u, t0 + datetime.timedelta(minutes=eid),
                         "view", 1.0))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )
    sf = str(tmp_path / "sf")
    ev.write.parquet(f"{sf}/events.parquet")
    out = entry.q_pareto_share(spark, sf).collect()
    assert sum(r["n_users"] for r in out) == 20
    total_share = sum(r["event_share_ppm"] for r in out)
    assert 999_000 <= total_share <= 1_000_000
    top = {r["decile"]: r["event_share_ppm"] for r in out}[1]
    assert top > 500_000  # the hub user alone holds >50%


def test_q3_revenue_scale_exact(spark, tmp_path):
    """One qualifying lineitem: price 10.00, discount 0.25 →
    revenue_e6 = 1000 · (10000−2500) = 7_500_000."""
    cust = spark.createDataFrame(
        [(1, "c", 0, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(7, 1, "O", 10.0, datetime.datetime(1995, 1, 1), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [(7, 1, 1, 1, 1.0, 10.0, 0.25, 0.0, "N", "O",
          datetime.datetime(1995, 6, 1))],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber long, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    )
    sf = str(tmp_path / "sf")
    cust.write.parquet(f"{sf}/customer.parquet")
    orders.write.parquet(f"{sf}/orders.parquet")
    li.write.parquet(f"{sf}/lineitem.parquet")
    out = entry.q_shipping_priority(spark, sf).collect()
    assert len(out) == 1
    assert out[0]["revenue_e6"] == 1000 * (10000 - 2500)
