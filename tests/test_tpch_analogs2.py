"""Hand-oracle tests for the round-5 TPC-H analog batch (Q5-Q22
adaptations in __spark_entry__): the driver's DuckDB gate checks them
end-to-end at sf0.01; these pin the exact-integer money semantics on
tiny frames where the expected values are computable by eye."""

import datetime

import __spark_entry__ as entry

_TS = datetime.datetime


def _write(spark, tmp_path, name, df):
    df.write.mode("overwrite").parquet(f"{tmp_path}/{name}.parquet")


def _mini_sf(spark, tmp_path):
    """Two customers, two orders, three lineitems, one nation chain."""
    _write(spark, tmp_path, "region",
           spark.createDataFrame([(0, "ASIA")], "r_regionkey int, r_name string"))
    _write(spark, tmp_path, "nation",
           spark.createDataFrame([(0, "NATION_1", 0), (1, "NATION_2", 0)],
                                 "n_nationkey int, n_name string, n_regionkey int"))
    _write(spark, tmp_path, "customer",
           spark.createDataFrame(
               [(1, "alice", 0, 100.0, "BUILDING"), (2, "bob", 1, -5.0, "AUTO")],
               "c_custkey long, c_name string, c_nationkey int, "
               "c_acctbal double, c_mktsegment string"))
    _write(spark, tmp_path, "supplier",
           spark.createDataFrame([(7, "s7", 0, 0.0), (8, "s8", 1, 0.0)],
                                 "s_suppkey long, s_name string, s_nationkey int, "
                                 "s_acctbal double"))
    _write(spark, tmp_path, "part",
           spark.createDataFrame(
               [(3, "p3", "Brand#13", "PROMO", 5, 10.0),
                (4, "p4", "Brand#22", "ECONOMY", 20, 20.0)],
               "p_partkey long, p_name string, p_brand string, p_type string, "
               "p_size int, p_retailprice double"))
    _write(spark, tmp_path, "orders",
           spark.createDataFrame(
               [(100, 1, "O", 50.0, _TS(1996, 5, 1), "1-URGENT"),
                (200, 2, "F", 70.0, _TS(1996, 6, 1), "2-HIGH")],
               "o_orderkey long, o_custkey long, o_orderstatus string, "
               "o_totalprice double, o_orderdate timestamp, o_orderpriority string"))
    # (orderkey, partkey, suppkey, line#, qty, price, disc, tax, rf, ls, shipdate)
    _write(spark, tmp_path, "lineitem",
           spark.createDataFrame(
               [(100, 3, 7, 1, 10.0, 100.0, 0.05, 0.0, "N", "O", _TS(1996, 6, 1)),
                (100, 4, 8, 2, 30.0, 200.0, 0.00, 0.0, "R", "F", _TS(1996, 7, 1)),
                (200, 3, 8, 1, 5.0, 50.0, 0.06, 0.0, "R", "F", _TS(1996, 2, 1))],
               "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
               "l_quantity double, l_extendedprice double, l_discount double, "
               "l_tax double, l_returnflag string, l_linestatus string, "
               "l_shipdate timestamp"))
    return str(tmp_path)


def test_forecast_revenue_exact(spark, tmp_path):
    """Only line 3 passes (qty 5 < 24, disc 0.06 in [0.05,0.07], 1996
    shipdate, qty 10 line also passes: disc 0.05 in band, qty 10 < 24)
    → forgone = 100.00·0.05 + 50.00·0.06 = 10000c·500 + 5000c·600."""
    sf = _mini_sf(spark, tmp_path)
    out = entry.q_forecast_revenue(spark, sf).collect()[0]
    assert out["forgone_e6"] == 10000 * 500 + 5000 * 600


def test_local_supplier_volume_requires_same_nation(spark, tmp_path):
    """Only (order 100 line 1: cust 1 nation 0, supp 7 nation 0)
    qualifies — line 2's supplier is nation 1; order 200's cust is
    nation 1 vs supp 8 nation 1 → also qualifies. Revenue per nation."""
    sf = _mini_sf(spark, tmp_path)
    rows = {r["n_name"]: r["revenue_e6"]
            for r in entry.q_local_supplier_volume(spark, sf).collect()}
    # NATION_1: price 100.00 disc .05 -> 10000c * 9500
    assert rows["NATION_1"] == 10000 * 9500
    # NATION_2: order 200 (cust bob nation 1) line ships supp 8 nation 1
    assert rows["NATION_2"] == 5000 * 9400
    assert len(rows) == 2


def test_customer_distribution_zero_bucket(spark, tmp_path):
    sf = _mini_sf(spark, tmp_path)
    rows = {r["c_count"]: r["custdist"]
            for r in entry.q_customer_distribution(spark, sf).collect()}
    assert rows == {1: 2}  # both customers have exactly 1 order


def test_large_orders_threshold(spark, tmp_path):
    """Order 100 has qty 10+30=40 ≤ 150, order 200 has 5 → no rows at
    the >150 threshold."""
    sf = _mini_sf(spark, tmp_path)
    assert entry.q_large_orders(spark, sf).count() == 0


def test_idle_customers_above_avg_and_no_recent_orders(spark, tmp_path):
    """alice (100.00) is the only positive balance → avg = 100.00; the
    strict > comparison excludes her, so no rows."""
    sf = _mini_sf(spark, tmp_path)
    assert entry.q_idle_customers(spark, sf).count() == 0


def test_returned_items_flags_only_r(spark, tmp_path):
    sf = _mini_sf(spark, tmp_path)
    rows = {r["c_custkey"]: r["revenue_e6"]
            for r in entry.q_returned_items(spark, sf).collect()}
    # quarter window 1996-10..1997-01 excludes both orders -> empty
    assert rows == {}


def test_promo_revenue_share(spark, tmp_path):
    sf = _mini_sf(spark, tmp_path)
    rows = {r["ship_month"]: r["promo_ppm"]
            for r in entry.q_promo_revenue(spark, sf).collect()}
    # 1996-06: only line 1 (PROMO part) -> 1_000_000
    assert rows["1996-06"] == 1_000_000
    # 1996-07: only line 2 (ECONOMY) -> 0
    assert rows["1996-07"] == 0
    # 1996-02: line 3 PROMO -> 1_000_000
    assert rows["1996-02"] == 1_000_000
