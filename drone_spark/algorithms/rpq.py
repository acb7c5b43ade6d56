"""Regular path queries (RPQ) over a labeled edge table — the
property-path primitive of SPARQL 1.1 / Cypher / GQL, absent from the
reference (whose only pattern operator is attribute-seeded graph
simulation, Sim.go — SURVEY §2.9).

An RPQ asks for vertex pairs (x, y) connected by SOME path whose edge-
label word matches a regular expression; answers are existential pairs
(set semantics), which is what keeps them tractable — concatenation is
an equi-join, alternation a UNION, bounded Kleene an unrolled
join-union prefix, and the final DISTINCT collapses path multiplicity
before it can blow up.

This module evaluates the fixed shape ``L0 · L1{1,m} · L2`` — one
concatenation chain with a bounded Kleene-plus in the middle — which
exercises all three composition rules. Scale shape: each step is a
frontier-pair (x, head) ⋈ labeled-edges equi-join with a DISTINCT
between steps (the CC frontier discipline applied to pair states);
label selection is a pushed-down filter on the scan, so each join only
reads its label's partition of the edge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def label_expr(n_labels: int = 3):
    """The synthetic deterministic edge labeling both engines share:
    label(src, dst) = (src + dst) % n_labels."""
    return ((F.col("src") + F.col("dst")) % n_labels).cast("int")


def rpq_chain(
    edges: DataFrame,
    labels: tuple[int, int, int] = (0, 1, 2),
    max_mid: int = 2,
    n_labels: int = 3,
) -> DataFrame:
    """Evaluate ``L0 · L1{1,max_mid} · L2`` over ``edges`` labeled by
    :func:`label_expr`. Returns DISTINCT (x, y) pairs."""
    l0, l1, l2 = labels
    lab = edges.select("src", "dst", label_expr(n_labels).alias("lab"))
    e = [lab.where(F.col("lab") == i).select("src", "dst") for i in (l0, l1, l2)]
    # heads after L0: pair state (x, h)
    state = e[0].select(F.col("src").alias("x"), F.col("dst").alias("h")).distinct()
    mids = None
    cur = state
    for _ in range(max_mid):
        cur = (
            cur.join(e[1], cur["h"] == e[1]["src"])
            .select("x", F.col("dst").alias("h"))
            .distinct()
        )
        mids = cur if mids is None else mids.unionAll(cur)
    mids = mids.distinct()
    return (
        mids.join(e[2], mids["h"] == e[2]["src"])
        .select("x", F.col("dst").alias("y"))
        .distinct()
    )


def rpq_chain_sql(
    edges_cte: str,
    labels: tuple[int, int, int] = (0, 1, 2),
    max_mid: int = 2,
    n_labels: int = 3,
) -> str:
    """DuckDB twin — ``edges_cte`` must define ``edges(src, dst)``."""
    l0, l1, l2 = labels
    ctes = [
        edges_cte,
        f"lab AS (SELECT src, dst, CAST((src + dst) % {n_labels} AS INTEGER)"
        " AS lab FROM edges)",
        f"e0 AS (SELECT src, dst FROM lab WHERE lab = {l0})",
        f"e1 AS (SELECT src, dst FROM lab WHERE lab = {l1})",
        f"e2 AS (SELECT src, dst FROM lab WHERE lab = {l2})",
        "m0 AS (SELECT DISTINCT src AS x, dst AS h FROM e0)",
    ]
    unions = []
    for i in range(1, max_mid + 1):
        ctes.append(
            f"m{i} AS (SELECT DISTINCT m.x, e1.dst AS h FROM m{i-1} m"
            " JOIN e1 ON e1.src = m.h)"
        )
        unions.append(f"SELECT x, h FROM m{i}")
    ctes.append(f"mids AS (SELECT DISTINCT x, h FROM ({' UNION ALL '.join(unions)}))")
    return (
        "WITH " + ", ".join(ctes)
        + " SELECT DISTINCT m.x, e2.dst AS y FROM mids m"
        " JOIN e2 ON e2.src = m.h"
    )
