"""Partition-quality metrics — edge cut, volume, conductance per part.

The metric that decides whether a graph partitioning survives 100 TB:
per-superstep network traffic is proportional to CUT edges (messages
that cross parts), and straggler risk to the VOLUME imbalance between
parts. The reference evaluates its METIS placements the same way
(partition quality drives its mirror/master placement — SURVEY §2.2);
here the evaluation is itself a distributed relational plan, so it can
audit a trillion-edge placement.

``partition_quality`` scores the modulo placement ``vid % B`` — the
deterministic stand-in for any hash partitioner (and exactly what
DuckDB can replay for the oracle). Passing ``assign`` scores an
arbitrary placement DataFrame instead, e.g. the output of
graph/partitioner.py or a Louvain community map — conductance over
communities is the standard community-quality readout.

All outputs are exact integers except the final conductance, reported
as ``conductance_ppm = ⌊10⁶·cut / min(vol, total_vol − vol)⌋`` (the
harmonic_ppm convention) so cross-engine hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..algorithms.cc import _sym_edges


def partition_quality(
    edges: DataFrame,
    num_buckets: int = 8,
    assign: DataFrame | None = None,
) -> DataFrame:
    """Per-part structure metrics over the undirected simple graph.

    Result: (bucket, n_vertices, volume, internal_edges, cut_edges,
    conductance_ppm) where volume = Σ deg(v) over members,
    internal/cut count each undirected edge once, and conductance uses
    the standard min(vol, 2|E| − vol) denominator (0-vol parts report
    0). ``assign``: optional (id, bucket) placement; default is
    ``id % num_buckets``.

    Plan: degrees and per-edge bucket lookups are partial-agg joins on
    the edge table — two shuffles total (by vertex for degree/volume,
    by canonical edge for internal/cut), no per-row Python, no
    driver-side state.
    """
    sym = _sym_edges(edges)
    und = sym.where(F.col("src") < F.col("dst"))  # each edge once
    if assign is None:
        b_of = lambda c: (F.col(c) % num_buckets).cast("long")  # noqa: E731
        src_b = und.select(
            "src", "dst", b_of("src").alias("sb"), b_of("dst").alias("db")
        )
        deg = sym.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        vert = deg.select("id", "deg", b_of("id").alias("bucket"))
    else:
        a = assign.select("id", F.col("bucket").cast("long").alias("bucket"))
        src_b = (
            und.join(a.withColumnRenamed("id", "src")
                     .withColumnRenamed("bucket", "sb"), "src")
            .join(a.withColumnRenamed("id", "dst")
                  .withColumnRenamed("bucket", "db"), "dst")
        )
        deg = sym.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        vert = deg.join(a, "id")

    per_vertex = vert.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.sum("deg").cast("long").alias("volume"),
    )
    internal = (
        src_b.where(F.col("sb") == F.col("db"))
        .groupBy(F.col("sb").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("internal_edges"))
    )
    # a cut edge charges BOTH endpoint buckets (standard conductance)
    cut_pairs = src_b.where(F.col("sb") != F.col("db"))
    cut = (
        cut_pairs.select(F.col("sb").alias("bucket"))
        .unionAll(cut_pairs.select(F.col("db").alias("bucket")))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cut_edges"))
    )
    total_vol = sym.count()  # 2|E| — one scalar action
    joined = (
        per_vertex.join(internal, "bucket", "left")
        .join(cut, "bucket", "left")
        .select(
            "bucket",
            "n_vertices",
            "volume",
            F.coalesce("internal_edges", F.lit(0)).cast("long")
            .alias("internal_edges"),
            F.coalesce("cut_edges", F.lit(0)).cast("long").alias("cut_edges"),
        )
    )
    # integer floor division in BOTH engines (DuckDB CAST(double AS
    # BIGINT) rounds while Spark's truncates — // and div always agree
    # on non-negative ints)
    return (
        joined.withColumn(
            "denom",
            F.least(F.col("volume"), F.lit(total_vol) - F.col("volume")),
        )
        .select(
            "bucket",
            "n_vertices",
            "volume",
            "internal_edges",
            "cut_edges",
            F.when(
                F.col("denom") > 0,
                F.expr("(1000000 * cut_edges) div denom"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("conductance_ppm"),
        )
    )


def partition_quality_sql(edges_cte: str, num_buckets: int = 8) -> str:
    """DuckDB twin of :func:`partition_quality` (modulo placement)."""
    return (
        f"WITH {edges_cte}, "
        "sym AS (SELECT src, dst FROM (SELECT src, dst FROM edges WHERE"
        " src <> dst UNION SELECT dst, src FROM edges WHERE src <> dst)), "
        "und AS (SELECT src, dst FROM sym WHERE src < dst), "
        "deg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY src), "
        f"vert AS (SELECT id, deg, CAST(id % {num_buckets} AS BIGINT)"
        " AS bucket FROM deg), "
        "pv AS (SELECT bucket, COUNT(*) AS n_vertices,"
        " CAST(SUM(deg) AS BIGINT) AS volume FROM vert GROUP BY bucket), "
        f"eb AS (SELECT CAST(src % {num_buckets} AS BIGINT) AS sb,"
        f" CAST(dst % {num_buckets} AS BIGINT) AS db FROM und), "
        "inte AS (SELECT sb AS bucket, COUNT(*) AS internal_edges FROM eb"
        " WHERE sb = db GROUP BY sb), "
        "cut AS (SELECT bucket, COUNT(*) AS cut_edges FROM"
        " (SELECT sb AS bucket FROM eb WHERE sb <> db"
        " UNION ALL SELECT db FROM eb WHERE sb <> db) GROUP BY bucket), "
        "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_vol FROM sym) "
        "SELECT pv.bucket, CAST(pv.n_vertices AS BIGINT) AS n_vertices,"
        " pv.volume, CAST(COALESCE(inte.internal_edges, 0) AS BIGINT)"
        " AS internal_edges, CAST(COALESCE(cut.cut_edges, 0) AS BIGINT)"
        " AS cut_edges, CAST(CASE WHEN"
        " LEAST(pv.volume, tot.total_vol - pv.volume) > 0 THEN"
        " (1000000 * COALESCE(cut.cut_edges, 0)) //"
        " LEAST(pv.volume, tot.total_vol - pv.volume)"
        " ELSE 0 END AS BIGINT) AS conductance_ppm"
        " FROM pv LEFT JOIN inte ON inte.bucket = pv.bucket"
        " LEFT JOIN cut ON cut.bucket = pv.bucket CROSS JOIN tot"
    )


def community_conductance(edges: DataFrame, assign: DataFrame) -> DataFrame:
    """Per-community conductance for an ARBITRARY-typed community key —
    the community-quality readout :func:`partition_quality` names, freed
    from its integer-bucket contract so host strings / Louvain labels /
    geo codes score directly.

    ``assign``: (id, community) — one row per vertex; any orderable
    type. Unassigned vertices are dropped from the audit (inner join —
    an assign map that misses vertices is itself the finding).

    Result: (community, n_vertices, volume, internal_edges, cut_edges,
    conductance_ppm) over the undirected simple graph, identical
    semantics to partition_quality: volume = Σ deg(v), internal/cut
    count each undirected edge once, cut charges both endpoint
    communities, conductance_ppm = ⌊10⁶·cut / min(vol, 2|E|−vol)⌋.

    Plan: same two-shuffle shape as partition_quality — the assign map
    joins the edge table twice (src, dst endpoint lookups — broadcast
    when small, hash join otherwise; Catalyst/AQE picks) and the
    per-community partial aggs combine map-side. No per-row Python.
    """
    sym = _sym_edges(edges)
    und = sym.where(F.col("src") < F.col("dst"))
    a = assign.select("id", "community")
    src_b = (
        und.join(
            a.withColumnRenamed("id", "src")
            .withColumnRenamed("community", "sb"),
            "src",
        ).join(
            a.withColumnRenamed("id", "dst")
            .withColumnRenamed("community", "db"),
            "dst",
        )
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    vert = deg.join(a, "id")
    per_vertex = vert.groupBy("community").agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.sum("deg").cast("long").alias("volume"),
    )
    internal = (
        src_b.where(F.col("sb") == F.col("db"))
        .groupBy(F.col("sb").alias("community"))
        .agg(F.count(F.lit(1)).alias("internal_edges"))
    )
    cut_pairs = src_b.where(F.col("sb") != F.col("db"))
    cut = (
        cut_pairs.select(F.col("sb").alias("community"))
        .unionAll(cut_pairs.select(F.col("db").alias("community")))
        .groupBy("community")
        .agg(F.count(F.lit(1)).alias("cut_edges"))
    )
    total_vol = sym.count()
    joined = (
        per_vertex.join(internal, "community", "left")
        .join(cut, "community", "left")
        .select(
            "community",
            "n_vertices",
            "volume",
            F.coalesce("internal_edges", F.lit(0)).cast("long")
            .alias("internal_edges"),
            F.coalesce("cut_edges", F.lit(0)).cast("long").alias("cut_edges"),
        )
    )
    return (
        joined.withColumn(
            "denom",
            F.least(F.col("volume"), F.lit(total_vol) - F.col("volume")),
        )
        .select(
            "community",
            "n_vertices",
            "volume",
            "internal_edges",
            "cut_edges",
            F.when(
                F.col("denom") > 0,
                F.expr("(1000000 * cut_edges) div denom"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("conductance_ppm"),
        )
    )


def community_conductance_sql(edges_cte: str, assign_cte: str) -> str:
    """DuckDB twin of :func:`community_conductance`. ``assign_cte``
    must define ``assign(id, community)``; ``edges_cte`` owns
    ``edges(src, dst)``."""
    return (
        f"WITH {edges_cte}, {assign_cte}, "
        "sym AS (SELECT src, dst FROM (SELECT src, dst FROM edges WHERE"
        " src <> dst UNION SELECT dst, src FROM edges WHERE src <> dst)), "
        "und AS (SELECT src, dst FROM sym WHERE src < dst), "
        "deg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY src), "
        "vert AS (SELECT d.id, d.deg, a.community FROM deg d"
        " JOIN assign a ON a.id = d.id), "
        "pv AS (SELECT community, COUNT(*) AS n_vertices,"
        " CAST(SUM(deg) AS BIGINT) AS volume FROM vert GROUP BY community), "
        "eb AS (SELECT sa.community AS sb, da.community AS db FROM und u"
        " JOIN assign sa ON sa.id = u.src JOIN assign da ON da.id = u.dst), "
        "inte AS (SELECT sb AS community, COUNT(*) AS internal_edges FROM eb"
        " WHERE sb = db GROUP BY sb), "
        "cut AS (SELECT community, COUNT(*) AS cut_edges FROM"
        " (SELECT sb AS community FROM eb WHERE sb <> db"
        " UNION ALL SELECT db FROM eb WHERE sb <> db) GROUP BY community), "
        "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_vol FROM sym) "
        "SELECT pv.community, CAST(pv.n_vertices AS BIGINT) AS n_vertices,"
        " pv.volume, CAST(COALESCE(inte.internal_edges, 0) AS BIGINT)"
        " AS internal_edges, CAST(COALESCE(cut.cut_edges, 0) AS BIGINT)"
        " AS cut_edges, CAST(CASE WHEN"
        " LEAST(pv.volume, tot.total_vol - pv.volume) > 0 THEN"
        " (1000000 * COALESCE(cut.cut_edges, 0)) //"
        " LEAST(pv.volume, tot.total_vol - pv.volume)"
        " ELSE 0 END AS BIGINT) AS conductance_ppm"
        " FROM pv LEFT JOIN inte ON inte.community = pv.community"
        " LEFT JOIN cut ON cut.community = pv.community CROSS JOIN tot"
    )
