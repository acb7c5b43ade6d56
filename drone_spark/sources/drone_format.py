"""Readers for the reference engine's on-disk text formats.

Covers SURVEY §2.1 S1–S5 so a dataset prepared for the reference loads
directly into this engine (whitespace-delimited text per
/root/reference/src/graph/graph.go):

- ``G.<i>``        edge list ``src dst``            (graph.go:341-349)
- ``Master.<i>``   ``vid mirrorWorker...``          (graph.go:389-416)
- ``Mirror.<i>``   ``vid masterWorker``             (graph.go:425-440)
- ``Degree.<i>``   ``vid global_outdeg``            (graph.go:470-483)
- ``Isolateds.<i>`` isolated vertex ids             (graph.go:443-457)

Parsing is ``spark.read.text`` + ``split``/``cast`` — pure Catalyst, no
Python; glob patterns read all partitions' files in one distributed
scan (one file per reference worker). Edge weights in ``G.*`` files are
accepted but ignored, matching the reference, which forces 1.0
(graph.go:357-362).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _tokens(df: DataFrame) -> DataFrame:
    return df.where(F.trim("value") != "").select(
        F.split(F.trim("value"), r"\s+").alias("t")
    )


def read_edge_list(spark: SparkSession, path: str) -> DataFrame:
    """``G.*`` files → edges(src, dst)."""
    return _tokens(spark.read.text(path)).select(
        F.col("t")[0].cast("long").alias("src"),
        F.col("t")[1].cast("long").alias("dst"),
    )


def read_masters(spark: SparkSession, path: str) -> DataFrame:
    """``Master.*`` → (vid, mirror_workers array<int>)."""
    return _tokens(spark.read.text(path)).select(
        F.col("t")[0].cast("long").alias("vid"),
        F.transform(F.slice("t", 2, 1_000_000), lambda x: x.cast("int")).alias(
            "mirror_workers"
        ),
    )


def read_mirrors(spark: SparkSession, path: str) -> DataFrame:
    """``Mirror.*`` → (vid, master_worker)."""
    return _tokens(spark.read.text(path)).select(
        F.col("t")[0].cast("long").alias("vid"),
        F.col("t")[1].cast("int").alias("master_worker"),
    )


def read_degrees(spark: SparkSession, path: str) -> DataFrame:
    """``Degree.*`` → (id, outdeg) — the global out-degree table."""
    return _tokens(spark.read.text(path)).select(
        F.col("t")[0].cast("long").alias("id"),
        F.col("t")[1].cast("long").alias("outdeg"),
    )


def read_isolated(spark: SparkSession, path: str) -> DataFrame:
    """``Isolateds.*`` → (id) — degree-0 vertices (dead code in the
    reference: loading is disabled at every call site, PRWorker.go:366)."""
    return _tokens(spark.read.text(path)).select(
        F.col("t")[0].cast("long").alias("id")
    )


def synth_attr(vertices: DataFrame, modulus: int = 100) -> DataFrame:
    """The reference's load-time attribute synthesis ``id % modulus``
    (graph.go:367,374; Settings.go:20 sets modulus=100)."""
    return vertices.select("id", F.pmod(F.col("id"), F.lit(modulus)).alias("attr"))
