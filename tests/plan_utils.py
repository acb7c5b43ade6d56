"""Shared physical-plan assertions for tests."""

import re

from pyspark.sql import functions as F


def scatter_exchanges(spark, e) -> list[str]:
    """Column names of every hash-partitioning Exchange in a canonical
    PageRank-style scatter join against edge table ``e`` (per-vertex
    state derived from e's src side, joined back on src, aggregated by
    dst), with broadcast disabled so a small state can't hide the
    distribution requirement. An ``'src'`` entry means the edge side
    re-shuffled — the thing bucketed storage exists to eliminate."""
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        state = e.select(F.col("src").alias("vid")).distinct().select(
            "vid", F.lit(1.0).alias("w")
        )
        j = state.join(e, state["vid"] == e["src"]).groupBy("dst").agg(
            F.sum("w").alias("acc")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
    return re.findall(r"Exchange hashpartitioning\(([a-z_]+)#", plan)
