"""Landmark closeness centrality — multi-source bounded BFS.

Exact closeness/harmonic centrality needs all-pairs distances (O(V·E)
— hopeless at web scale); the standard scalable estimator is distances
from a small deterministic landmark set (Indyk 1999; Potamias et al.
CIKM 2009; HyperBall is the sketch-based cousin). This module runs ONE
multi-source BFS carrying (vertex, landmark, dist) rows under the
superstep engine: landmarks are the ``n_landmarks`` vertices with the
smallest ``md5(vid)`` (hash-uniform and deterministic — the IVF-init
convention, similarity.py), and the flood is frontier-only: a
(vid, lm) pair enters the state exactly once, at its BFS level, so a
superstep's work is O(edges incident to the frontier), never O(V·L).

Distance bounding: BFS level k IS distance k, so ``max_dist`` doubles
as the engine's ``max_supersteps`` — a bounded-radius sweep, the form
landmark methods use in production (and what keeps a stray
pathological diameter from running away at 100 TB).

Result rows stay integral (n_reached, sum_dist per vertex) so the
DuckDB oracle hash-matches exactly; closeness = n/sum is the caller's
one float division, deliberately outside the distributed job
(degree_correlation's convention, linkstats.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine.superstep import RunResult, SuperstepEngine


def landmark_distances(
    spark: SparkSession,
    engine: SuperstepEngine,
    edges: DataFrame,
    n_landmarks: int = 8,
    max_dist: int = 64,
    run_id: str = "landmarks",
    num_parts: int | None = None,
) -> RunResult:
    """BFS distances from ``n_landmarks`` md5-chosen landmark vertices
    along edge direction. Final state: (vid, lm, dist, delta) — one row
    per (reachable vertex, landmark) pair with the exact shortest
    hop-count ≤ ``max_dist``."""
    n_parts = num_parts or int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(n_parts, "src")
        .persist()
    )
    n_edges = e.count()
    verts = (
        e.select(F.col("src").alias("vid"))
        .unionAll(e.select(F.col("dst").alias("vid")))
        .distinct()
    )
    landmarks = verts.orderBy(F.md5(F.col("vid").cast("string"))).limit(
        n_landmarks
    )

    def init() -> DataFrame:
        return landmarks.select(
            "vid",
            F.col("vid").alias("lm"),
            F.lit(0).cast("long").alias("dist"),
            F.lit(1.0).alias("delta"),
        )

    def step(state: DataFrame, _k: int) -> DataFrame:
        # BFS invariant: the frontier is exactly last level's new rows,
        # and any (vid, lm) they reach that isn't in the state yet gets
        # its true shortest distance now — no relaxation ever needed
        frontier = state.where(F.col("delta") > 0).select(
            F.col("vid").alias("src"), "lm", "dist"
        )
        cand = (
            frontier.join(e, "src")
            .groupBy(F.col("dst").alias("vid"), F.col("lm"))
            .agg((F.min("dist") + 1).alias("dist"))
        )
        new = cand.join(state.select("vid", "lm"), ["vid", "lm"], "left_anti")
        return state.select("vid", "lm", "dist", F.lit(0.0).alias("delta")).unionAll(
            new.select("vid", "lm", "dist", F.lit(1.0).alias("delta"))
        )

    try:
        return engine.run(
            run_id, init, step, tol=0.0, max_supersteps=max_dist,
            edges_per_step=n_edges,
        )
    finally:
        e.unpersist()


def closeness_centrality(
    spark: SparkSession,
    engine: SuperstepEngine,
    edges: DataFrame,
    n_landmarks: int = 8,
    max_dist: int = 64,
    run_id: str = "closeness",
    num_parts: int | None = None,
) -> DataFrame:
    """Landmark closeness summary per vertex: (vid, n_reached,
    sum_dist) over landmarks that reach it within ``max_dist`` hops —
    closeness ≈ n_reached / sum_dist, harmonic variants are one
    ``transform`` away. Integral outputs, hash-exact."""
    run = landmark_distances(
        spark, engine, edges, n_landmarks=n_landmarks, max_dist=max_dist,
        run_id=run_id, num_parts=num_parts,
    )
    return run.state.groupBy("vid").agg(
        F.count(F.lit(1)).alias("n_reached"),
        F.sum("dist").alias("sum_dist"),
    )


def distance_distribution(
    spark: SparkSession,
    engine: SuperstepEngine,
    edges: DataFrame,
    n_landmarks: int = 8,
    max_dist: int = 64,
    run_id: str = "distdist",
    num_parts: int | None = None,
) -> DataFrame:
    """Landmark-sampled neighborhood function N(d): (dist, n_pairs)
    rows counting (landmark, vertex) pairs at each exact hop distance —
    the distribution behind average-distance and effective-diameter
    estimates (Palmer et al. ANF, KDD 2002; Boldi & Vigna HyperBall;
    the "19 degrees of separation" measurement of Broder et al. WWW
    2000 §4 on the same crawl the bowtie comes from).

    One multi-source BFS (shared with closeness), then a global
    O(max_dist)-row aggregate. Output stays integral — effective
    diameter = smallest d with cumsum(n_pairs)·10 ≥ 9·total is the
    caller's arithmetic over ≤ ``max_dist`` rows (see
    :func:`effective_diameter`)."""
    run = landmark_distances(
        spark, engine, edges, n_landmarks=n_landmarks, max_dist=max_dist,
        run_id=run_id, num_parts=num_parts,
    )
    return run.state.groupBy("dist").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


def effective_diameter(dist_rows, pct_num: int = 9, pct_den: int = 10) -> int:
    """Effective diameter from collected (dist, n_pairs) rows: the
    smallest d whose cumulative pair count reaches ``pct_num/pct_den``
    (default 90%) of all reachable pairs. Pure integer comparison —
    cum·den ≥ num·total — so the answer is exact, never float-rounded.
    Driver-side on ≤ max_dist rows by design."""
    rows = sorted((int(r["dist"]), int(r["n_pairs"])) for r in dist_rows)
    total = sum(n for _, n in rows)
    if total == 0:
        return 0
    cum = 0
    for d, n in rows:
        cum += n
        if cum * pct_den >= pct_num * total:
            return d
    return rows[-1][0]


def harmonic_centrality(
    spark: SparkSession,
    engine: SuperstepEngine,
    edges: DataFrame,
    n_landmarks: int = 8,
    max_dist: int = 64,
    run_id: str = "harmonic",
    num_parts: int | None = None,
) -> DataFrame:
    """Landmark harmonic centrality per vertex: (vid, n_reached,
    harmonic_ppm) with harmonic_ppm = Σ_lm ⌊10⁶ / d(lm, v)⌋ over the
    landmarks that reach v in 1..max_dist hops (the d=0 self row is
    excluded — 1/0 is the reason harmonic papers define it away).
    Harmonic centrality (Boldi & Vigna 2014) is the closeness variant
    that handles disconnected graphs gracefully: unreachable pairs
    contribute 0 instead of poisoning the mean.

    Exact by construction: each term is an integer quotient, so the
    sum is order-independent and the DuckDB oracle hash-matches —
    unlike a float Σ1/d whose value depends on reduction order.
    Shares :func:`landmark_distances`' single multi-source BFS."""
    run = landmark_distances(
        spark, engine, edges, n_landmarks=n_landmarks, max_dist=max_dist,
        run_id=run_id, num_parts=num_parts,
    )
    return (
        run.state.where(F.col("dist") >= 1)
        .groupBy("vid")
        .agg(
            F.count(F.lit(1)).alias("n_reached"),
            F.sum(F.expr("1000000 div dist")).cast("long")
            .alias("harmonic_ppm"),
        )
    )


KATZ_SCALE = 10**9  # fixed-point scale: katz 1.0 == 10^9


def katz_fixed(
    spark: SparkSession,
    engine: SuperstepEngine,
    edges: DataFrame,
    iters: int = 4,
    alpha_num: int = 5,
    alpha_den: int = 100,
    run_id: str = "katz",
) -> DataFrame:
    """Katz centrality (Katz 1953), ``iters`` supersteps of the fixed
    truncated series x_k = β + α·Aᵀ x_{k-1} with β = 1, in scaled-integer
    arithmetic (α = alpha_num/alpha_den applied as one multiply before
    ONE floor division per vertex, so quantization error doesn't
    accumulate per-message). Integer sums are order-independent —
    Spark and the DuckDB oracle hash-match bit-for-bit, the pagerank5
    convention (__spark_entry__.q_pagerank5).

    Unlike PageRank, Katz does NOT normalize by out-degree: every
    out-link carries the full score, so hubs amplify — which is why
    convergence requires α < 1/λ_max (λ_max ≤ max in-degree). At 4
    iterations and α = 0.05 the int64 headroom holds up to in-degree
    ~10³ per vertex on average paths; larger α or deeper series should
    drop KATZ_SCALE accordingly (the engine raises nothing — int64
    overflow is the caller's contract, as in every fx kernel here).

    Plan shape per superstep: one scatter join (state ⋈ edges on src),
    one partial-agg SUM by dst, one join-back — identical to the
    relational PageRank superstep, so the bucketed zero-edge-shuffle
    path applies unchanged. Result: (vid, katz_fx).
    """
    from ..graph.builder import vertices

    beta_fx = F.lit(KATZ_SCALE)

    def init() -> DataFrame:
        return vertices(edges).select(
            F.col("id").alias("vid"),
            beta_fx.cast("long").alias("katz_fx"),
            F.lit(1.0).alias("delta"),
        )

    def step(state: DataFrame, _k: int) -> DataFrame:
        acc = (
            state.select("vid", "katz_fx")
            .join(edges, F.col("vid") == F.col("src"))
            .groupBy("dst")
            .agg(F.sum("katz_fx").alias("acc"))
        )
        new_fx = beta_fx + F.expr(
            f"({alpha_num} * coalesce(acc, 0L)) div {alpha_den}"
        )
        return state.join(acc, state["vid"] == acc["dst"], "left").select(
            "vid",
            new_fx.cast("long").alias("katz_fx"),
            F.abs(new_fx - F.col("katz_fx")).cast("double").alias("delta"),
        )

    res = engine.run(run_id, init, step, tol=0.0, max_supersteps=iters)
    return res.state.select("vid", "katz_fx")


def katz_fixed_sql(
    edges_cte: str,
    iters: int = 4,
    alpha_num: int = 5,
    alpha_den: int = 100,
) -> str:
    """DuckDB twin of :func:`katz_fixed`: unrolled CTE chain over an
    ``edges(src, dst)`` CTE. Every column pinned to BIGINT (DuckDB
    widens SUM to HUGEINT — the pagerank5 oracle's type note)."""
    ctes = [
        f"WITH {edges_cte}",
        "v AS (SELECT DISTINCT id FROM (SELECT src AS id FROM edges"
        " UNION ALL SELECT dst AS id FROM edges))",
        f"k0 AS (SELECT id, {KATZ_SCALE}::BIGINT AS katz FROM v)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"k{k} AS (SELECT v.id, CAST({KATZ_SCALE} + "
            f"({alpha_num} * COALESCE(s.acc, 0)) // {alpha_den} AS BIGINT)"
            f" AS katz FROM v LEFT JOIN (SELECT e.dst AS id,"
            f" CAST(SUM(p.katz) AS BIGINT) AS acc FROM k{k-1} p"
            f" JOIN edges e ON e.src = p.id GROUP BY e.dst) s"
            f" ON v.id = s.id)"
        )
    return (
        ", ".join(ctes)
        + f" SELECT id AS vid, CAST(katz AS BIGINT) AS katz_fx FROM k{iters}"
    )


def stress_centrality(
    edges: DataFrame,
    n_sources: int = 4,
    max_depth: int = 8,
) -> DataFrame:
    """Sampled-source *stress centrality* (Shimbel 1953) — the
    integer-exact member of the betweenness family: stress(v) =
    Σ_{s,t} σ_st(v), the number of shortest paths passing THROUGH v,
    restricted to ``n_sources`` deterministic sources and paths of
    ≤ ``max_depth`` hops. Brandes-style betweenness needs σ-ratio
    *divisions* (floats — summation-order hazards this repo bans from
    oracle-checked kernels); stress is the same two-sweep dependency
    accumulation with every quantity a path COUNT, so Spark and the
    unrolled DuckDB twin hash-match bit-for-bit.

    Sources: the ``n_sources`` vertices minimizing md5(id) — the
    repo's standard deterministic-uniform sample (same device as
    ops/sampling.sample_bucket; id-order sampling would bias toward
    old/low-id pages).

    Two sweeps per source, both level-synchronous on the directed
    graph (Brandes 2001's structure):

    1. forward BFS to ``max_depth``: visited(s, v, level, σ_sv) where
       σ is the shortest-path count — frontier ⋈ edges, partial-agg
       SUM(σ) by (s, dst), anti-join against visited. All sources
       advance in the SAME per-level job (state is keyed by s), so the
       sweep costs max_depth jobs total, not per source.
    2. backward path-count accumulation on the implied BFS DAG
       (edges u→w with level(w) = level(u)+1): N(v) = Σ_{w∈succ}
       (1 + N(w)) — the number of shortest paths STARTING at v, an
       integer recurrence evaluated from the deepest level up.

    stress(v) = Σ_s σ_sv · N_s(v) over non-source rows — σ_sv paths
    arrive, each extends along N_s(v) downstream continuations, and
    every (s,t)-shortest-path-through-v is counted exactly once.
    Result: (vid, stress) for vertices with stress > 0.

    At-scale shape: per level one edge join against the |frontier|-row
    state (the SSSP frontier discipline) and one partial agg; the
    backward sweep touches each DAG edge once per level band. σ and N
    are path counts — int64 headroom is the caller's contract for
    depth × branching (katz_fixed's convention).
    """
    from ..graph.builder import vertices

    spark = edges.sparkSession
    srcs = (
        vertices(edges)
        .orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
        .limit(n_sources)
        .select(F.col("id").alias("s"))
    )
    # localCheckpoint per level (the engine's own superstep discipline,
    # superstep.py:386): the union/anti-join lineage otherwise grows
    # with depth and Catalyst re-analysis dominates past ~5 levels
    frontier = srcs.select(
        "s", F.col("s").alias("v"), F.lit(1).cast("long").alias("sigma")
    ).localCheckpoint(eager=True)
    levels = [frontier]  # levels[l]: (s, v, sigma) at depth l
    visited = frontier.select("s", "v").localCheckpoint(eager=True)
    for _ in range(max_depth):
        nxt = (
            levels[-1]
            .join(edges, F.col("v") == F.col("src"))
            .groupBy("s", F.col("dst").alias("nv"))
            .agg(F.sum("sigma").alias("sigma"))
            .withColumnRenamed("nv", "v")
            .join(visited, ["s", "v"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        levels.append(nxt)
        visited = visited.unionAll(nxt.select("s", "v")).localCheckpoint(
            eager=True
        )

    # BFS-DAG edges between consecutive levels, computed per band so
    # each band's backward pass joins only its own rows.
    n_next = levels[-1].select(
        "s", "v", F.lit(0).cast("long").alias("n")
    )
    acc = None  # (s, v, sigma*n) contributions, non-source levels only
    for lu in range(len(levels) - 2, -1, -1):
        nxt_ren = n_next.select(
            F.col("s").alias("s2"),
            F.col("v").alias("w"),
            F.col("n").alias("nw"),
        )
        band = (
            levels[lu]
            .select("s", F.col("v").alias("u"))
            .join(edges, F.col("u") == F.col("src"))
            .join(
                nxt_ren,
                (F.col("dst") == F.col("w")) & (F.col("s") == F.col("s2")),
            )
            .groupBy("s", "u")
            .agg(F.sum(F.lit(1) + F.col("nw")).alias("n"))
        )
        n_cur = (
            levels[lu]
            .select("s", "v")
            .join(
                band.select("s", F.col("u").alias("v"), "n"),
                ["s", "v"],
                "left",
            )
            .select("s", "v", F.coalesce("n", F.lit(0)).alias("n"))
            .localCheckpoint(eager=True)
        )
        if lu > 0:
            contrib = (
                levels[lu]
                .join(n_cur, ["s", "v"])
                .select("s", "v", (F.col("sigma") * F.col("n")).alias("c"))
            )
            acc = contrib if acc is None else acc.unionAll(contrib)
        n_next = n_cur
    if acc is None:
        return spark.createDataFrame([], "vid long, stress long")
    return (
        acc.groupBy(F.col("v").alias("vid"))
        .agg(F.sum("c").cast("long").alias("stress"))
        .where(F.col("stress") > 0)
    )


def stress_centrality_sql(
    edges_cte: str,
    n_sources: int = 4,
    max_depth: int = 8,
) -> str:
    """DuckDB twin of :func:`stress_centrality` — unrolled level CTEs
    both directions, BIGINT-pinned."""
    d = max_depth
    ctes = [
        f"WITH {edges_cte}",
        "verts AS (SELECT DISTINCT id FROM (SELECT src AS id FROM edges"
        " UNION ALL SELECT dst FROM edges))",
        f"srcs AS (SELECT id AS s FROM verts"
        f" ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT {n_sources})",
        "b0 AS (SELECT s, s AS v, 1::BIGINT AS sigma FROM srcs)",
        "vis0 AS (SELECT s, v FROM b0)",
    ]
    # MATERIALIZED throughout: b{l}/vis{l} are each referenced twice
    # downstream, so DuckDB's default CTE inlining would re-expand the
    # chain 2^depth times (the kcore oracle's same footgun)
    for l in range(1, d + 1):
        ctes.append(
            f"b{l} AS MATERIALIZED (SELECT f.s, f.v, f.sigma FROM ("
            f"SELECT b.s, e.dst AS v, CAST(SUM(b.sigma) AS BIGINT)"
            f" AS sigma FROM b{l-1} b JOIN edges e ON e.src = b.v"
            f" GROUP BY b.s, e.dst) f LEFT JOIN vis{l-1} x"
            f" ON x.s = f.s AND x.v = f.v WHERE x.v IS NULL)"
        )
        ctes.append(
            f"vis{l} AS MATERIALIZED (SELECT s, v FROM vis{l-1}"
            f" UNION ALL SELECT s, v FROM b{l})"
        )
    ctes.append(f"n{d} AS (SELECT s, v, 0::BIGINT AS n FROM b{d})")
    contribs = []
    for lu in range(d - 1, -1, -1):
        ctes.append(
            f"n{lu} AS MATERIALIZED (SELECT b.s, b.v,"
            f" CAST(COALESCE(g.n, 0) AS BIGINT) AS n FROM b{lu} b"
            f" LEFT JOIN (SELECT u.s, u.v, SUM(1 + nn.n) AS n"
            f" FROM b{lu} u JOIN edges e ON e.src = u.v"
            f" JOIN n{lu+1} nn ON nn.s = u.s AND nn.v = e.dst"
            f" GROUP BY u.s, u.v) g ON g.s = b.s AND g.v = b.v)"
        )
        if lu > 0:
            contribs.append(
                f"SELECT b.s, b.v, b.sigma * n.n AS c FROM b{lu} b"
                f" JOIN n{lu} n ON n.s = b.s AND n.v = b.v"
            )
    union = " UNION ALL ".join(contribs)
    return (
        ", ".join(ctes)
        + f" SELECT v AS vid, CAST(SUM(c) AS BIGINT) AS stress"
        f" FROM ({union}) GROUP BY v HAVING SUM(c) > 0"
    )


EIG_SCALE = 10**6  # fixed-point scale: max-normalized eigen 1.0 == 10^6


def eigenvector_fixed(
    spark: SparkSession,
    engine: SuperstepEngine,
    edges: DataFrame,
    iters: int = 4,
    run_id: str = "eigen",
) -> DataFrame:
    """Eigenvector centrality (Bonacich 1972) by ``iters`` supersteps of
    max-normalized power iteration in scaled-integer arithmetic:
    x_k = Aᵀ x_{k-1}, then x_k ← ⌊EIG_SCALE · x_k / max(x_k)⌋. Unlike
    the L2 norm (HITS, hits.py — float, 9-sig-fig canonicalization),
    the L∞ norm keeps every round a single integer floor division by a
    global scalar, so Spark and the DuckDB oracle hash-match
    bit-for-bit (the pagerank5/katz4 convention) while still converging
    to the principal eigenvector direction (scaled to max = EIG_SCALE).

    The global max is one 1-row aggregate broadcast back via crossJoin
    — the same ≤1-row exchange HITS pays for its norm (hits.py:38-46),
    Spark's reduce+broadcast idiom. Everything else per superstep is
    the standard scatter shape: state ⋈ edges on src, partial-agg SUM
    by dst, join-back — so the bucketed zero-edge-shuffle path applies
    unchanged.

    int64 headroom: x ≤ EIG_SCALE, so acc ≤ indeg_max · EIG_SCALE and
    the pre-division product EIG_SCALE · acc needs
    indeg_max < 2^63 / EIG_SCALE² ≈ 9.2·10⁶ — beyond that, drop
    EIG_SCALE (overflow is the caller's contract, the katz_fixed
    convention). Vertices with no in-edges read 0 after round 1 —
    eigenvector centrality's standard sink behavior on directed graphs.

    Result: (vid, eig_fx). The reference has no eigen kernel (its set
    is PR/CC/SSSP/Sim — PageRank.go:18-111 is the nearest relative);
    this completes the classic centrality quartet (degree / Katz /
    PageRank / eigenvector) the link-analysis literature treats as one
    family.
    """
    from ..graph.builder import vertices

    def init() -> DataFrame:
        return vertices(edges).select(
            F.col("id").alias("vid"),
            F.lit(EIG_SCALE).cast("long").alias("eig_fx"),
            F.lit(1.0).alias("delta"),
        )

    def step(state: DataFrame, _k: int) -> DataFrame:
        acc = (
            state.select("vid", "eig_fx")
            .join(edges, F.col("vid") == F.col("src"))
            .groupBy("dst")
            .agg(F.sum("eig_fx").alias("acc"))
        )
        mx = acc.agg(F.max("acc").alias("_m"))
        new_fx = F.when(
            F.col("_m") > 0,
            F.expr(f"({EIG_SCALE} * coalesce(acc, 0L)) div _m"),
        ).otherwise(F.lit(0))
        return (
            state.join(acc, state["vid"] == acc["dst"], "left")
            .crossJoin(F.broadcast(mx))
            .select(
                "vid",
                new_fx.cast("long").alias("eig_fx"),
                F.abs(new_fx - F.col("eig_fx")).cast("double").alias("delta"),
            )
        )

    res = engine.run(run_id, init, step, tol=0.0, max_supersteps=iters)
    return res.state.select("vid", "eig_fx")


def eigenvector_fixed_sql(edges_cte: str, iters: int = 4) -> str:
    """DuckDB twin of :func:`eigenvector_fixed`: unrolled CTE chain
    over an ``edges(src, dst)`` CTE, one (acc, max, renorm) triple per
    round. Every column pinned to BIGINT (DuckDB widens SUM/MAX to
    HUGEINT — the pagerank5 oracle's type note)."""
    ctes = [
        f"WITH {edges_cte}",
        "v AS (SELECT DISTINCT id FROM (SELECT src AS id FROM edges"
        " UNION ALL SELECT dst AS id FROM edges))",
        f"x0 AS (SELECT id, {EIG_SCALE}::BIGINT AS eig FROM v)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"a{k} AS (SELECT e.dst AS id, CAST(SUM(p.eig) AS BIGINT)"
            f" AS acc FROM x{k-1} p JOIN edges e ON e.src = p.id"
            f" GROUP BY e.dst)"
        )
        ctes.append(
            f"m{k} AS (SELECT CAST(MAX(acc) AS BIGINT) AS m FROM a{k})"
        )
        ctes.append(
            f"x{k} AS (SELECT v.id, CAST(CASE WHEN m.m > 0 THEN"
            f" ({EIG_SCALE} * COALESCE(a.acc, 0)) // m.m ELSE 0 END"
            f" AS BIGINT) AS eig FROM v LEFT JOIN a{k} a ON v.id = a.id"
            f" CROSS JOIN m{k} m)"
        )
    return (
        ", ".join(ctes)
        + f" SELECT id AS vid, CAST(eig AS BIGINT) AS eig_fx FROM x{iters}"
    )


def landmark_eccentricity(
    spark: SparkSession,
    engine: SuperstepEngine,
    edges: DataFrame,
    n_landmarks: int = 8,
    max_dist: int = 64,
    run_id: str = "ecc",
    num_parts: int | None = None,
) -> DataFrame:
    """Sampled eccentricities — the classic 2-sweep/iFUB ingredient for
    diameter estimation (Magnien, Latapy & Habib 2009; Crescenzi et al.
    2013): ecc(s) = max_v d(s, v) over reachable v, from the
    ``n_landmarks`` md5-smallest sources, distances bounded at
    ``max_dist`` hops. max(ecc) over any source set is a DIAMETER LOWER
    BOUND, and the per-source (ecc, n_reached, sum_dist) triple is the
    standard sampled profile of a webgraph's reach structure.

    One aggregation over :func:`landmark_distances`' final state — the
    multi-source frontier BFS is shared machinery (same cost shape:
    per level one frontier ⋈ edges join, anti-join dedup), so this adds
    ZERO new supersteps beyond the BFS itself. All-integer output:
    (landmark, ecc, n_reached, sum_dist) hash-matches the
    recursive-CTE twin bit-for-bit.
    """
    res = landmark_distances(
        spark, engine, edges,
        n_landmarks=n_landmarks, max_dist=max_dist,
        run_id=run_id, num_parts=num_parts,
    )
    return (
        res.state.groupBy(F.col("lm").alias("landmark"))
        .agg(
            F.max("dist").cast("long").alias("ecc"),
            F.count(F.lit(1)).cast("long").alias("n_reached"),
            F.sum("dist").cast("long").alias("sum_dist"),
        )
    )


BC_SCALE = 10**6  # ppm fixed point for the pair-dependency ratios


def betweenness_ppm(
    edges: DataFrame,
    n_sources: int = 4,
    max_depth: int = 8,
) -> DataFrame:
    """Sampled-source *betweenness* (Brandes 2001) in ppm fixed point —
    the σ-ratio sibling of :func:`stress_centrality` (same forward
    sweep, same BFS DAG), with the backward pair-dependency recurrence
    integer-ized so Spark and the unrolled DuckDB twin hash-match:

        δ(v) = Σ_{w ∈ succ_DAG(v)}  (σ_sv · (10^6 + δ(w))) DIV σ_sw

    (classic Brandes is the same formula with real division; each term
    floors once per DAG edge — deterministic on both engines, error
    < 1 ppm per edge). bc_ppm(v) = Σ_s δ_s(v) over non-source rows,
    restricted to ``n_sources`` md5-uniform sources and ≤ ``max_depth``
    hops, like stress.

    At-scale shape is stress's: all sources advance in the same
    per-level job (state keyed by s), one frontier⋈edges partial agg
    per level each direction, localCheckpoint per level to keep
    Catalyst re-analysis bounded.
    """
    from ..graph.builder import vertices

    spark = edges.sparkSession
    srcs = (
        vertices(edges)
        .orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
        .limit(n_sources)
        .select(F.col("id").alias("s"))
    )
    frontier = srcs.select(
        "s", F.col("s").alias("v"), F.lit(1).cast("long").alias("sigma")
    ).localCheckpoint(eager=True)
    levels = [frontier]
    visited = frontier.select("s", "v").localCheckpoint(eager=True)
    for _ in range(max_depth):
        nxt = (
            levels[-1]
            .join(edges, F.col("v") == F.col("src"))
            .groupBy("s", F.col("dst").alias("nv"))
            .agg(F.sum("sigma").alias("sigma"))
            .withColumnRenamed("nv", "v")
            .join(visited, ["s", "v"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        levels.append(nxt)
        visited = visited.unionAll(nxt.select("s", "v")).localCheckpoint(
            eager=True
        )

    d_next = levels[-1].select(
        "s", "v", "sigma", F.lit(0).cast("long").alias("d")
    )
    acc = None
    for lu in range(len(levels) - 2, -1, -1):
        nxt_ren = d_next.select(
            F.col("s").alias("s2"),
            F.col("v").alias("w"),
            F.col("sigma").alias("sigma_w"),
            F.col("d").alias("dw"),
        )
        band = (
            levels[lu]
            .select("s", F.col("v").alias("u"), F.col("sigma").alias("sigma_u"))
            .join(edges, F.col("u") == F.col("src"))
            .join(
                nxt_ren,
                (F.col("dst") == F.col("w")) & (F.col("s") == F.col("s2")),
            )
            .groupBy("s", "u")
            .agg(
                F.sum(
                    F.expr(f"(sigma_u * ({BC_SCALE} + dw)) DIV sigma_w")
                ).alias("d")
            )
        )
        d_cur = (
            levels[lu]
            .join(
                band.select("s", F.col("u").alias("v"), "d"),
                ["s", "v"],
                "left",
            )
            .select(
                "s", "v", "sigma", F.coalesce("d", F.lit(0)).alias("d")
            )
            .localCheckpoint(eager=True)
        )
        if lu > 0:
            contrib = d_cur.select("s", "v", F.col("d").alias("c"))
            acc = contrib if acc is None else acc.unionAll(contrib)
        d_next = d_cur
    if acc is None:
        return spark.createDataFrame([], "vid long, bc_ppm long")
    return (
        acc.groupBy(F.col("v").alias("vid"))
        .agg(F.sum("c").cast("long").alias("bc_ppm"))
        .where(F.col("bc_ppm") > 0)
    )


def betweenness_ppm_sql(
    edges_cte: str,
    n_sources: int = 4,
    max_depth: int = 8,
) -> str:
    """DuckDB twin of :func:`betweenness_ppm` — stress twin's unrolled
    structure with σ carried through the backward chain."""
    d = max_depth
    ctes = [
        f"WITH {edges_cte}",
        "verts AS (SELECT DISTINCT id FROM (SELECT src AS id FROM edges"
        " UNION ALL SELECT dst FROM edges))",
        f"srcs AS (SELECT id AS s FROM verts"
        f" ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT {n_sources})",
        "b0 AS (SELECT s, s AS v, 1::BIGINT AS sigma FROM srcs)",
        "vis0 AS (SELECT s, v FROM b0)",
    ]
    for l in range(1, d + 1):
        ctes.append(
            f"b{l} AS MATERIALIZED (SELECT f.s, f.v, f.sigma FROM ("
            f"SELECT b.s, e.dst AS v, CAST(SUM(b.sigma) AS BIGINT)"
            f" AS sigma FROM b{l-1} b JOIN edges e ON e.src = b.v"
            f" GROUP BY b.s, e.dst) f LEFT JOIN vis{l-1} x"
            f" ON x.s = f.s AND x.v = f.v WHERE x.v IS NULL)"
        )
        ctes.append(
            f"vis{l} AS MATERIALIZED (SELECT s, v FROM vis{l-1}"
            f" UNION ALL SELECT s, v FROM b{l})"
        )
    ctes.append(
        f"d{d} AS (SELECT s, v, sigma, 0::BIGINT AS d FROM b{d})"
    )
    contribs = []
    for lu in range(d - 1, -1, -1):
        ctes.append(
            f"d{lu} AS MATERIALIZED (SELECT b.s, b.v, b.sigma,"
            f" CAST(COALESCE(g.d, 0) AS BIGINT) AS d FROM b{lu} b"
            f" LEFT JOIN (SELECT u.s, u.v,"
            f" SUM((u.sigma * ({BC_SCALE} + nn.d)) // nn.sigma) AS d"
            f" FROM b{lu} u JOIN edges e ON e.src = u.v"
            f" JOIN d{lu+1} nn ON nn.s = u.s AND nn.v = e.dst"
            f" GROUP BY u.s, u.v) g ON g.s = b.s AND g.v = b.v)"
        )
        if lu > 0:
            contribs.append(f"SELECT s, v, d AS c FROM d{lu}")
    union = " UNION ALL ".join(contribs)
    return (
        ", ".join(ctes)
        + f" SELECT v AS vid, CAST(SUM(c) AS BIGINT) AS bc_ppm"
        f" FROM ({union}) GROUP BY v HAVING SUM(c) > 0"
    )


def apsp_histogram(edges: DataFrame, max_depth: int = 8) -> DataFrame:
    """EXACT all-pairs shortest-path distance histogram — every vertex
    is a BFS source at once (the stress forward sweep with σ dropped):
    state is (s, v) pairs, one frontier⋈edges job per level, anti-join
    against visited. Tractable precisely where it matters — site-level
    graphs (hosts are ~5 orders sparser than pages); the page-level
    variant is the sampled landmark machinery (closeness /
    distance_distribution). Returns (dist, n_pairs) for 1 ≤ dist ≤
    max_depth — the exact denominator behind mean distance and
    effective diameter."""
    from ..graph.builder import vertices

    spark = edges.sparkSession
    v = vertices(edges)
    frontier = v.select(F.col("id").alias("s"), F.col("id").alias("v"))
    visited = frontier.localCheckpoint(eager=True)
    frontier = visited
    rows = []
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(edges, F.col("v") == F.col("src"))
            .select("s", F.col("dst").alias("v"))
            .distinct()
            .join(visited, ["s", "v"], "left_anti")
            .localCheckpoint(eager=True)
        )
        n = nxt.count()
        if n == 0:
            break
        rows.append((d, n))
        visited = visited.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return spark.createDataFrame(rows, "dist int, n_pairs long")


def apsp_histogram_sql(edges_cte: str, max_depth: int = 8) -> str:
    """DuckDB twin of :func:`apsp_histogram` — unrolled MATERIALIZED
    level CTEs (the stress twin's device)."""
    ctes = [
        f"WITH {edges_cte}",
        "verts AS (SELECT DISTINCT id FROM (SELECT src AS id FROM edges"
        " UNION ALL SELECT dst FROM edges))",
        "f0 AS (SELECT id AS s, id AS v FROM verts)",
        "vis0 AS (SELECT s, v FROM f0)",
    ]
    counts = []
    for d in range(1, max_depth + 1):
        ctes.append(
            f"f{d} AS MATERIALIZED (SELECT DISTINCT g.s, g.v FROM "
            f"(SELECT f.s, e.dst AS v FROM f{d-1} f JOIN edges e"
            f" ON e.src = f.v) g LEFT JOIN vis{d-1} x"
            " ON x.s = g.s AND x.v = g.v WHERE x.v IS NULL)"
        )
        ctes.append(
            f"vis{d} AS MATERIALIZED (SELECT s, v FROM vis{d-1}"
            f" UNION ALL SELECT s, v FROM f{d})"
        )
        counts.append(
            f"SELECT {d} AS dist, COUNT(*) AS n_pairs FROM f{d}"
        )
    return (
        ", ".join(ctes)
        + " SELECT CAST(dist AS INTEGER) AS dist,"
        " CAST(n_pairs AS BIGINT) AS n_pairs"
        f" FROM ({' UNION ALL '.join(counts)}) WHERE n_pairs > 0"
    )


def apsp_eccentricity(edges: DataFrame, max_depth: int = 8) -> DataFrame:
    """EXACT per-vertex eccentricity (and reach count) from the same
    all-source keyed BFS as :func:`apsp_histogram` — at site level the
    exact radius/diameter table the sampled landmark machinery
    (landmark_eccentricity) lower-bounds at page level. Returns
    (vid, ecc, n_reached) with ecc = max BFS level reached from the
    vertex within ``max_depth`` (vertices reaching nothing have
    ecc = 0, n_reached = 0)."""
    from ..graph.builder import vertices

    v = vertices(edges)
    frontier = v.select(F.col("id").alias("s"), F.col("id").alias("v"))
    visited = frontier.localCheckpoint(eager=True)
    frontier = visited
    per_level = []
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(edges, F.col("v") == F.col("src"))
            .select("s", F.col("dst").alias("v"))
            .distinct()
            .join(visited, ["s", "v"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        per_level.append(
            nxt.groupBy("s").agg(
                F.lit(d).alias("lvl"), F.count(F.lit(1)).alias("n")
            )
        )
        visited = visited.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    if not per_level:
        return v.select(
            F.col("id").alias("vid"),
            F.lit(0).cast("long").alias("ecc"),
            F.lit(0).cast("long").alias("n_reached"),
        )
    allv = per_level[0]
    for p in per_level[1:]:
        allv = allv.unionAll(p)
    stats = allv.groupBy("s").agg(
        F.max("lvl").cast("long").alias("ecc"),
        F.sum("n").cast("long").alias("n_reached"),
    )
    return (
        v.join(stats, v["id"] == stats["s"], "left")
        .select(
            F.col("id").alias("vid"),
            F.coalesce("ecc", F.lit(0)).cast("long").alias("ecc"),
            F.coalesce("n_reached", F.lit(0)).cast("long").alias("n_reached"),
        )
    )


def apsp_eccentricity_sql(edges_cte: str, max_depth: int = 8) -> str:
    """DuckDB twin of :func:`apsp_eccentricity`."""
    ctes = [
        f"WITH {edges_cte}",
        "verts AS (SELECT DISTINCT id FROM (SELECT src AS id FROM edges"
        " UNION ALL SELECT dst FROM edges))",
        "f0 AS (SELECT id AS s, id AS v FROM verts)",
        "vis0 AS (SELECT s, v FROM f0)",
    ]
    levels = []
    for d in range(1, max_depth + 1):
        ctes.append(
            f"f{d} AS MATERIALIZED (SELECT DISTINCT g.s, g.v FROM "
            f"(SELECT f.s, e.dst AS v FROM f{d-1} f JOIN edges e"
            f" ON e.src = f.v) g LEFT JOIN vis{d-1} x"
            " ON x.s = g.s AND x.v = g.v WHERE x.v IS NULL)"
        )
        ctes.append(
            f"vis{d} AS MATERIALIZED (SELECT s, v FROM vis{d-1}"
            f" UNION ALL SELECT s, v FROM f{d})"
        )
        levels.append(
            f"SELECT s, {d} AS lvl, COUNT(*) AS n FROM f{d} GROUP BY s"
        )
    return (
        ", ".join(ctes)
        + ", lv AS (" + " UNION ALL ".join(levels) + ")"
        + ", st AS (SELECT s, CAST(MAX(lvl) AS BIGINT) AS ecc,"
        " CAST(SUM(n) AS BIGINT) AS n_reached FROM lv WHERE n > 0 GROUP BY s)"
        + " SELECT verts.id AS vid, COALESCE(st.ecc, 0) AS ecc,"
        " COALESCE(st.n_reached, 0) AS n_reached"
        " FROM verts LEFT JOIN st ON verts.id = st.s"
    )
