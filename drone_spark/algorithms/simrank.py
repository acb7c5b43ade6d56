"""SimRank structural similarity (Jeh & Widom, KDD 2002).

``s(a,b)`` — "two pages are similar if they are linked from similar
pages" — is the canonical link-based similarity on directed graphs:

    s(a,a) = 1
    s(a,b) = C / (|I(a)|·|I(b)|) · Σ_{i∈I(a), j∈I(b)} s(i,j)

with in-neighbor sets ``I(·)`` and decay ``C`` (classically 0.8). The
reference engine has no pairwise-similarity kernel at all (its four
compiled algorithms are PR/CC/SSSP/Sim, worker*.go — "Sim" there is
*graph-pattern simulation*, unrelated); this module adds the missing
classic in the repo's fixed-iteration integer convention.

**Determinism convention** (katz_fixed / pagerank5): a pinned number of
iterations in scaled-int64 arithmetic — every sum is an integer (order
free), every normalization is ONE floor division — so Spark and the
unrolled DuckDB twin hash-match bit-for-bit, with no float summation
order or convergence-depth ambiguity.

**Sparsity & scale.** SimRank's textbook hazard is the O(V²) pair
state. Three things bound it here:

1. State holds only ``a<b`` pairs with score > 0; iteration t reaches
   exactly the pairs with in-paths of equal length ≤ t to a common
   ancestor, so the frontier grows with the (in,in)-join, not V².
2. Integer truncation IS thresholding: a pair whose exact score falls
   below 1/SIM_SCALE floors to 0 and drops out of the state — a
   deterministic epsilon-prune both engines apply identically (the
   Lizorkin et al., VLDB 2008 threshold-sieving idea, done in the
   integer domain for free).
3. ``max_in_degree`` caps the in-neighbor fan-in per vertex: a hub
   with d in-links contributes d² join rows per pair, so web-scale
   runs exclude mega-hubs from the *candidate* side exactly like the
   dedup tier's ``max_doc_freq`` cap (ops/dedup.py) — same
   safe-by-default reasoning, oracle-mirrored (vertices over the cap
   keep their diagonal but generate no pairs).

Plan shape per iteration: the symmetric pair state joins the in-edge
table twice (i→a side, j→b side) — two hash joins + one partial-agg
SUM by (a,b); the common-in-neighbor diagonal term is one self-join
computed once and reused every iteration. All arithmetic is Catalyst
codegen; nothing Python-side, no window, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SIM_SCALE = 10**6  # fixed point: s = 1.0 == 10^6


def _in_edges(edges: DataFrame, max_in_degree: int | None) -> DataFrame:
    inn = edges.select(
        F.col("dst").alias("v"), F.col("src").alias("i")
    ).distinct()
    if max_in_degree is not None:
        keep = (
            inn.groupBy("v")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") <= max_in_degree)
            .select("v")
        )
        inn = inn.join(keep, "v")
    return inn


def simrank_fixed(
    edges: DataFrame,
    iters: int = 3,
    c_num: int = 4,
    c_den: int = 5,
    max_in_degree: int | None = 64,
) -> DataFrame:
    """``iters`` SimRank iterations from s₀ = identity, in scaled-int64.

    Per iteration, for a<b with in-degrees dₐ, d_b (both ≥1, both ≤
    ``max_in_degree``):

        s'(a,b) = (c_num · [Σ_{i≠j} s(i,j) + SIM_SCALE·|I(a)∩I(b)|])
                  div (c_den · dₐ · d_b)

    — the diagonal of the pair matrix never materializes (its
    contribution is the common-in-neighbor count term). Result:
    (a, b, simrank_fx) for surviving a<b pairs.
    """
    inn = _in_edges(edges, max_in_degree).persist()
    deg = inn.groupBy("v").agg(F.count(F.lit(1)).alias("d"))

    # |I(a) ∩ I(b)| for a<b — fixed across iterations, computed once.
    x = inn.select(F.col("v").alias("a"), "i")
    y = inn.select(F.col("v").alias("b"), "i")
    common = (
        x.join(y, "i")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))

    def normalize(total_col: F.Column) -> F.Column:
        return F.expr(
            f"({c_num} * total) div ({c_den} * da * db)"
        ).cast("long")

    # s1 directly from the common-count (s0 is the identity matrix).
    state = (
        common.join(da, "a").join(db, "b")
        .withColumn("total", F.col("cnt") * F.lit(SIM_SCALE))
        .select(
            "a", "b", normalize(F.col("total")).alias("s"),
        )
        .where(F.col("s") > 0)
    )

    ea = inn.select(F.col("v").alias("a"), F.col("i").alias("pi"))
    eb = inn.select(F.col("v").alias("b"), F.col("i").alias("pj"))
    for _ in range(1, iters):
        sym = state.unionAll(
            state.select(
                F.col("b").alias("a"), F.col("a").alias("b"), "s"
            )
        ).select(F.col("a").alias("pi"), F.col("b").alias("pj"), "s")
        pairsum = (
            ea.join(sym, "pi")
            .join(eb, "pj")
            .where(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.sum("s").alias("ps"))
        )
        # FULL outer: a pair can have similar parents but zero common
        # in-neighbors (ps without cnt) or vice versa (cnt without ps).
        state = (
            common.join(pairsum, ["a", "b"], "full")
            .join(da, "a").join(db, "b")
            .withColumn(
                "total",
                F.coalesce("ps", F.lit(0))
                + F.coalesce("cnt", F.lit(0)) * F.lit(SIM_SCALE),
            )
            .select("a", "b", normalize(F.col("total")).alias("s"))
            .where(F.col("s") > 0)
        )
    out = state.select(
        "a", "b", F.col("s").alias("simrank_fx")
    ).persist()
    out.count()
    inn.unpersist()
    common.unpersist()
    return out


def simrank_fixed_sql(
    edges_cte: str,
    iters: int = 3,
    c_num: int = 4,
    c_den: int = 5,
    max_in_degree: int | None = 64,
) -> str:
    """DuckDB twin of :func:`simrank_fixed` — unrolled CTE chain over
    an ``edges(src, dst)`` CTE, BIGINT-pinned (the pagerank5 HUGEINT
    note)."""
    cap = (
        ""
        if max_in_degree is None
        else (
            ", capped AS (SELECT v FROM (SELECT v, COUNT(*) AS d FROM inn0"
            f" GROUP BY v) WHERE d <= {max_in_degree})"
        )
    )
    inn = (
        "inn0 AS (SELECT DISTINCT dst AS v, src AS i FROM edges)"
        + cap
        + (
            ", inn AS (SELECT inn0.v, inn0.i FROM inn0 JOIN capped"
            " ON capped.v = inn0.v)"
            if max_in_degree is not None
            else ", inn AS (SELECT v, i FROM inn0)"
        )
    )
    ctes = [
        f"WITH {edges_cte}",
        inn,
        "deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM inn"
        " GROUP BY v)",
        "com AS (SELECT x.v AS a, y.v AS b, CAST(COUNT(*) AS BIGINT)"
        " AS cnt FROM inn x JOIN inn y ON x.i = y.i AND x.v < y.v"
        " GROUP BY x.v, y.v)",
        f"s1 AS (SELECT * FROM (SELECT c.a, c.b,"
        f" CAST(({c_num} * c.cnt * {SIM_SCALE})"
        f" // ({c_den} * da.d * db.d) AS BIGINT) AS s FROM com c"
        " JOIN deg da ON da.v = c.a JOIN deg db ON db.v = c.b)"
        " WHERE s > 0)",
    ]
    for t in range(2, iters + 1):
        ctes.append(
            f"sym{t-1} AS (SELECT a AS pi, b AS pj, s FROM s{t-1}"
            f" UNION ALL SELECT b, a, s FROM s{t-1})"
        )
        ctes.append(
            f"ps{t} AS (SELECT ea.v AS a, eb.v AS b,"
            " CAST(SUM(p.s) AS BIGINT) AS ps"
            f" FROM inn ea JOIN sym{t-1} p ON p.pi = ea.i"
            " JOIN inn eb ON eb.i = p.pj AND ea.v < eb.v"
            " GROUP BY ea.v, eb.v)",
        )
        ctes.append(
            f"s{t} AS (SELECT * FROM (SELECT q.a, q.b,"
            f" CAST(({c_num} * (COALESCE(q.ps, 0)"
            f" + COALESCE(q.cnt, 0) * {SIM_SCALE}))"
            f" // ({c_den} * da.d * db.d) AS BIGINT) AS s"
            " FROM (SELECT COALESCE(c.a, p.a) AS a,"
            " COALESCE(c.b, p.b) AS b, c.cnt, p.ps FROM com c"
            f" FULL JOIN ps{t} p ON p.a = c.a AND p.b = c.b) q"
            " JOIN deg da ON da.v = q.a JOIN deg db ON db.v = q.b)"
            " WHERE s > 0)",
        )
    return (
        ", ".join(ctes)
        + f" SELECT a, b, s AS simrank_fx FROM s{iters}"
    )
