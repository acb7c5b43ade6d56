"""Link-graph structure statistics — clustering, link prediction,
reciprocity.

Standard web-graph analyses a link-graph engine serves beyond ranking
(all from the public literature; none present in the reference, which
ships only PR/CC/SSSP/Sim — SURVEY §2.3): per-vertex local clustering
coefficient (Watts-Strogatz), Adamic-Adar link prediction, and edge
reciprocity. All three are pure relational plans — no engine loop, no
Python rows — and each has an exact DuckDB oracle in
``__spark_entry__.py``.

At-scale shape notes:

- Triangle enumeration reuses the degree-ordered orientation
  (algorithms/triangles.py): forward-adjacency is O(sqrt(E)) per
  vertex even for hubs, so the intersection join's row count is
  O(#triangles) — the output's own size, the lower bound.
- Adamic-Adar pairs explode quadratically in the degree of the shared
  neighbor, so the hub cap (``max_degree``) is ON by default, same
  safe-by-default contract as dedup's ``max_doc_freq``: a z with
  10^6 neighbors would contribute 10^12 pairs of near-zero score
  (1/ln 10^6); capping drops only those vanishing contributions and
  bounds the join at cap² rows per center. Top-k output plans as
  TakeOrderedAndProject — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .cc import _sym_edges
from .triangles import _oriented


def vertex_triangles(edges: DataFrame) -> DataFrame:
    """Triangles per vertex: each triangle credits ALL THREE corners
    (unlike ``triangle_count(per_vertex=True)``, which credits only the
    orientation's first endpoint — fine for sums, wrong for clustering
    coefficients). Result: (id, n_triangles), vertices with none absent.
    """
    fwd = _oriented(edges)
    adj = fwd.groupBy(F.col("src").alias("u")).agg(
        F.sort_array(F.collect_list("dst")).alias("nbrs")
    )
    tri = (
        fwd.join(
            adj.withColumnRenamed("u", "src").withColumnRenamed("nbrs", "src_nbrs"),
            "src",
        )
        .join(
            adj.withColumnRenamed("u", "dst").withColumnRenamed("nbrs", "dst_nbrs"),
            "dst",
        )
        .select(
            "src",
            "dst",
            F.explode(F.array_intersect("src_nbrs", "dst_nbrs")).alias("w"),
        )
    )
    credits = (
        tri.select(F.col("src").alias("id"))
        .unionAll(tri.select(F.col("dst").alias("id")))
        .unionAll(tri.select(F.col("w").alias("id")))
    )
    return credits.groupBy("id").agg(F.count(F.lit(1)).alias("n_triangles"))


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per vertex over the undirected
    simple graph: cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)); 0 when deg < 2.
    Result: (vid, deg, n_triangles, cc). The division is one IEEE
    double op on exact integers, so Spark and DuckDB agree bitwise —
    no rounding needed."""
    sym = _sym_edges(edges)
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    t = vertex_triangles(edges)
    n_tri = F.coalesce("n_triangles", F.lit(0))
    return deg.join(t, "id", "left").select(
        F.col("id").alias("vid"),
        "deg",
        n_tri.alias("n_triangles"),
        F.when(
            F.col("deg") >= 2,
            2.0 * n_tri / (F.col("deg").cast("double") * (F.col("deg") - 1.0)),
        )
        .otherwise(0.0)
        .alias("cc"),
    )


def adamic_adar(
    edges: DataFrame,
    k: int = 50,
    max_degree: int = 256,
    exclude_existing: bool = True,
) -> DataFrame:
    """Top-k Adamic-Adar link predictions over the undirected simple
    graph: score(u,w) = Σ_{z ∈ N(u)∩N(w)} 1/ln(deg(z)) — the classic
    common-neighbor weighting (Adamic & Adar 2003) used for "related
    pages"/crawl-frontier suggestion.

    ``max_degree`` caps the shared-neighbor degree (safe-by-default hub
    cap — see module docstring); ``exclude_existing`` drops pairs
    already linked. Scores are rounded to 6 decimals before ranking so
    cross-engine float-summation order cannot reorder the top-k
    (same convention as bm25); ties break on (u, w)."""
    sym = _sym_edges(edges)
    deg = sym.groupBy(F.col("src").alias("z")).agg(F.count(F.lit(1)).alias("dz"))
    centers = deg.where((F.col("dz") >= 2) & (F.col("dz") <= max_degree))
    a = sym.select(F.col("src").alias("z"), F.col("dst").alias("u"))
    b = sym.select(F.col("src").alias("z"), F.col("dst").alias("w"))
    pairs = (
        a.join(b, "z")
        .where(F.col("u") < F.col("w"))
        .join(centers, "z")
        .select("u", "w", (1.0 / F.log(F.col("dz").cast("double"))).alias("s"))
    )
    scores = pairs.groupBy("u", "w").agg(F.round(F.sum("s"), 6).alias("aa_score"))
    if exclude_existing:
        scores = scores.join(
            sym.select(F.col("src").alias("u"), F.col("dst").alias("w")),
            ["u", "w"],
            "left_anti",
        )
    return scores.orderBy(F.desc("aa_score"), "u", "w").limit(k)


def reciprocity(edges: DataFrame) -> DataFrame:
    """Directed-graph reciprocity: the fraction of (deduped, non-loop)
    edges whose reverse edge also exists — the standard webgraph
    mutual-link statistic. One result row:
    (n_edges, n_reciprocal, reciprocity).

    Both counts are single aggregates; the crossJoin is 1-row × 1-row
    (same pattern as the HITS norm join)."""
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    tot = e.agg(F.count(F.lit(1)).alias("n_edges"))
    rec = e.join(rev, ["src", "dst"]).agg(F.count(F.lit(1)).alias("n_reciprocal"))
    return tot.crossJoin(rec).select(
        "n_edges",
        "n_reciprocal",
        F.when(
            F.col("n_edges") > 0,
            F.col("n_reciprocal").cast("double") / F.col("n_edges"),
        )
        .otherwise(0.0)
        .alias("reciprocity"),
    )


def degree_correlation(edges: DataFrame) -> DataFrame:
    """Exact integer moments for the directed degree-degree correlation
    (assortativity): over every deduped non-loop edge (u, v), x =
    outdeg(u) and y = indeg(v). One result row of BIGINT sums —
    (n_edges, sum_x, sum_y, sum_xy, sum_x2, sum_y2) — from which
    Pearson's r (Newman 2002's out-in assortativity) follows in one
    driver-side division. Keeping the output integral makes it
    hash-exact across engines; the float division is the caller's
    one-liner, not the distributed job's.

    Plan: two partial-agg degree tables broadcast-or-shuffle joined
    onto the edge list, then a single global aggregate — map-side
    combine everywhere, output is 1 row."""
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    outd = e.groupBy(F.col("src")).agg(F.count(F.lit(1)).alias("x"))
    ind = e.groupBy(F.col("dst")).agg(F.count(F.lit(1)).alias("y"))
    xy = e.join(outd, "src").join(ind, "dst")
    return xy.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum("x").alias("sum_x"),
        F.sum("y").alias("sum_y"),
        F.sum(F.col("x") * F.col("y")).alias("sum_xy"),
        F.sum(F.col("x") * F.col("x")).alias("sum_x2"),
        F.sum(F.col("y") * F.col("y")).alias("sum_y2"),
    )


def joint_degree_histogram(edges: DataFrame) -> DataFrame:
    """Joint (out-degree, in-degree) distribution over edges, bucketed
    by power-of-two degree class: (x_bucket, y_bucket, n_edges) where
    bucket = ⌊log₂ deg⌋ computed as ``length(bin(deg)) − 1`` — pure
    integer/string semantics, so Spark and any SQL oracle agree exactly
    (float log2 can misround at bucket boundaries).

    The output is O(log²(max_degree)) rows — a web-scale-safe summary
    of the full joint distribution (the raw (x, y) histogram would be
    O(distinct degrees²))."""
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    outd = e.groupBy(F.col("src")).agg(F.count(F.lit(1)).alias("x"))
    ind = e.groupBy(F.col("dst")).agg(F.count(F.lit(1)).alias("y"))
    return (
        e.join(outd, "src")
        .join(ind, "dst")
        .select(
            (F.length(F.bin("x")) - 1).cast("long").alias("x_bucket"),
            (F.length(F.bin("y")) - 1).cast("long").alias("y_bucket"),
        )
        .groupBy("x_bucket", "y_bucket")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )


def snapshot_diff(edges_a: DataFrame, edges_b: DataFrame) -> DataFrame:
    """Crawl-to-crawl link-graph churn: compare two directed edge
    snapshots (A = earlier, B = later) and report, per vertex that
    appears in either, its out-degree in each plus how many of its
    out-edges were added (in B only) and removed (in A only):
    (vid, deg_a, deg_b, added, removed).

    The daily-crawl monitoring query: feeds re-crawl prioritization
    (high-churn hosts re-crawl sooner) and validates incremental
    runs (Σ added/removed bounds the frontier warm-start PR /
    warm-start CC must reprocess).

    Plan: both snapshots dedup, then one full outer join on the edge
    key and a single partial-agg rollup per src — two shuffles total,
    both on (src, dst); no driver data."""
    a = edges_a.select("src", "dst").distinct().withColumn("in_a", F.lit(1))
    b = edges_b.select("src", "dst").distinct().withColumn("in_b", F.lit(1))
    merged = a.join(b, ["src", "dst"], "full_outer").select(
        "src",
        F.coalesce("in_a", F.lit(0)).alias("in_a"),
        F.coalesce("in_b", F.lit(0)).alias("in_b"),
    )
    return merged.groupBy(F.col("src").alias("vid")).agg(
        F.sum("in_a").cast("long").alias("deg_a"),
        F.sum("in_b").cast("long").alias("deg_b"),
        F.sum(
            F.when((F.col("in_b") == 1) & (F.col("in_a") == 0), 1).otherwise(0)
        ).cast("long").alias("added"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 0), 1).otherwise(0)
        ).cast("long").alias("removed"),
    )


def _und_weighted(edges: DataFrame, weight_col: str | None) -> "DataFrame":
    """Undirected weighted simple edges (a < b, w): weight_col=None
    gives w=1 per distinct undirected edge (the unweighted case);
    otherwise w = Σ of both directions' integer weights."""
    if weight_col is None:
        sym = _sym_edges(edges)
        return sym.where(F.col("src") < F.col("dst")).distinct().select(
            F.col("src").alias("a"), F.col("dst").alias("b"),
            F.lit(1).cast("long").alias("w"),
        )
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )


def modularity(
    edges: DataFrame,
    communities: DataFrame,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-community modularity decomposition of a given partition over
    the undirected simple graph: Newman-Girvan
    Q = Σ_c [e_c/m − (d_c/2m)²] where m = #undirected edges, e_c =
    edges internal to community c, d_c = Σ degrees of c's vertices.

    ``communities``: (vid, community) — must cover every edge endpoint
    (web pipelines score structural partitions like host / shard /
    label-propagation assignments, which are total by construction).

    Returns (community, internal_edges, degree_sum, q_num) with
    q_num = 4·m·e_c − d_c², all BIGINT, so
    Q = Σ q_num / (4m²) exactly — the integer decomposition keeps the
    result bit-stable across engines (no float sum-order variance).
    int64 bound: |q_num| ≤ 4m·max(e_c, m) — exact up to m ≈ 1.5·10⁹
    edges; past that compute the float contribution from the two
    integer columns instead (they never overflow: both ≤ 2m).

    Plan: symmetrize + canonical-orient once, two broadcast-free
    equi-joins of the edge list against the (small, one row per
    vertex) assignment, then two partial-agg rollups keyed by
    community — community cardinality ≪ |V|, so the final agg is
    tiny; m is one scalar read.

    ``weight_col`` generalizes to the weighted form (host graphs carry
    n_links): m becomes W = Σw, degrees become strengths, e_c becomes
    internal weight — same integer decomposition, same exactness (the
    weighted Q of Newman 2004)."""
    und = _und_weighted(edges, weight_col)
    asg = communities.select("vid", "community")
    m = und.agg(F.sum("w")).first()[0] or 0
    e_c = (
        und.join(asg.withColumnRenamed("vid", "a")
                 .withColumnRenamed("community", "ca"), "a")
        .join(asg.withColumnRenamed("vid", "b")
              .withColumnRenamed("community", "cb"), "b")
        .where(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.sum("w").alias("internal_edges"))
    )
    deg = (
        und.select(F.col("a").alias("vid"), "w")
        .unionAll(und.select(F.col("b").alias("vid"), "w"))
        .groupBy("vid")
        .agg(F.sum("w").alias("deg"))
    )
    d_c = (
        deg.join(asg, "vid")
        .groupBy("community")
        .agg(F.sum("deg").alias("degree_sum"))
    )
    return (
        d_c.join(e_c, "community", "left")
        .select(
            "community",
            F.coalesce("internal_edges", F.lit(0)).cast("long")
            .alias("internal_edges"),
            F.col("degree_sum").cast("long").alias("degree_sum"),
            (
                F.lit(4 * m) * F.coalesce("internal_edges", F.lit(0))
                - F.col("degree_sum") * F.col("degree_sum")
            ).cast("long").alias("q_num"),
        )
    )


def modularity_q(
    edges: DataFrame,
    communities: DataFrame,
    weight_col: str | None = None,
) -> float:
    """Scalar Newman-Girvan Q of the partition (float convenience over
    :func:`modularity`'s exact integer decomposition)."""
    m = _und_weighted(edges, weight_col).agg(F.sum("w")).first()[0] or 0
    if m == 0:
        return 0.0
    s = modularity(edges, communities, weight_col).agg(
        F.sum("q_num")).first()[0]
    return float(s) / (4.0 * m * m)


def cocitation(
    edges: DataFrame,
    min_common: int = 2,
    max_out_degree: int | None = 64,
) -> DataFrame:
    """Co-citation similarity (Small 1973): two targets are similar
    when many sources link to BOTH — the classic related-page signal
    (its transpose, bibliographic coupling, is the same op on reversed
    edges). Returns (a, b, common, jaccard_ppm) for target pairs with
    ≥ ``min_common`` shared in-linkers; jaccard_ppm =
    ⌊10⁶·|Na∩Nb| / |Na∪Nb|⌋ over in-neighbor sets — integer ppm keeps
    the output exact across engines.

    ``max_out_degree`` is the safe-by-default hub cap (same contract
    as adamic_adar's ``max_degree`` / dedup's ``max_doc_freq``): a
    source linking k targets contributes k² co-citation pairs, so one
    10⁶-out-degree hub page (a sitemap, a spam ring) would emit 10¹²
    rows. Sources above the cap are dropped BEFORE the self-join,
    bounding any source's contribution at cap²; in-neighbor sets (and
    hence jaccard) are computed over the same capped edge set so the
    ratio stays consistent. ``None`` restores exact all-sources
    semantics — the oracle replays whichever is configured.

    Plan: dedup → optional cap semi-join → src self-join (candidates
    keyed by source, never all-pairs) → one partial-agg count per
    (a, b) → two joins against the tiny per-target in-degree table."""
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    if max_out_degree is not None:
        keep = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("od"))
            .where(F.col("od") <= max_out_degree)
            .select("src")
        )
        e = e.join(keep, "src")
    indeg = e.groupBy(F.col("dst").alias("t")).agg(
        F.count(F.lit(1)).alias("ind")
    )
    pairs = (
        e.alias("x")
        .join(e.alias("y"), "src")
        .where(F.col("x.dst") < F.col("y.dst"))
        .groupBy(F.col("x.dst").alias("a"), F.col("y.dst").alias("b"))
        .agg(F.count(F.lit(1)).alias("common"))
        .where(F.col("common") >= min_common)
    )
    return (
        pairs.join(indeg.withColumnRenamed("t", "a")
                   .withColumnRenamed("ind", "ia"), "a")
        .join(indeg.withColumnRenamed("t", "b")
              .withColumnRenamed("ind", "ib"), "b")
        .select(
            "a",
            "b",
            F.col("common").cast("long").alias("common"),
            F.expr("(1000000 * common) div (ia + ib - common)")
            .cast("long").alias("jaccard_ppm"),
        )
    )


def louvain_sweep(
    edges: DataFrame,
    communities: DataFrame | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """One synchronous Louvain phase-1 sweep (Blondel et al. 2008;
    the synchronous-move distributed variant of e.g. Que et al. 2015):
    every vertex evaluates the exact modularity gain of moving into
    each neighboring community and takes the best strictly-positive
    move, all moves applied at once. Returns (vid, community) for
    every vertex of the symmetrized simple graph.

    ``communities`` (vid, community) seeds the sweep; ``None`` is the
    canonical singleton start (community(v) = v). Iterating the sweep
    + :func:`modularity_q` is Louvain's inner loop; one sweep is
    already the standard "refine a structural partition by modularity
    gain" primitive.

    Exact integer scoring — candidate community c for vertex v scores
    score_fx(c) = 2m·k_v→c − d_v·(tot_c − d_v·[c = c_v])
    (the ΔQ numerator over a common 2m² denominator, after removing v
    from its own community; k_v→c = edges from v into c, tot_c = Σ
    degrees in c, m = undirected edge count). v moves to the
    max-score candidate iff that beats its stay score; ties break on
    the smaller community id, so the sweep is deterministic and
    layout-independent. int64-exact to m ≈ 10¹⁵/d_max.

    Plan: degrees + community totals are two partial-agg rollups;
    k_v→c is one partial-agg over the edge list joined to the (1 row
    per vertex) assignment; the argmax is a max_by over each vertex's
    OWN neighbor communities — bounded by degree, never a global
    sort. No Python, no collect (m is one scalar read).

    ``weight_col`` generalizes every count to a weight sum (weighted
    Louvain, e.g. over the host graph's n_links): degrees become
    strengths, k_v→c the weight into c, m the total weight W — the
    same exact integer scoring."""
    und = _und_weighted(edges, weight_col)
    sym = und.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    ).unionAll(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    )
    verts = sym.select(F.col("src").alias("vid")).distinct()
    if communities is None:
        asg = verts.select("vid", F.col("vid").alias("community"))
    else:
        asg = verts.join(
            communities.select("vid", "community"), "vid", "left"
        ).select("vid", F.coalesce("community", F.col("vid")).alias("community"))
    m = und.agg(F.sum("w")).first()[0] or 0
    deg = sym.groupBy(F.col("src").alias("vid")).agg(
        F.sum("w").alias("deg")
    )
    tot = (
        asg.join(deg, "vid")
        .groupBy("community")
        .agg(F.sum("deg").alias("tot"))
    )
    # k_v→c over neighbor communities (v's own community included when
    # it holds a neighbor)
    kvc = (
        sym.join(
            asg.select(F.col("vid").alias("dst"), F.col("community").alias("c")),
            "dst",
        )
        .groupBy(F.col("src").alias("vid"), "c")
        .agg(F.sum("w").alias("k"))
    )
    scored = (
        kvc.join(asg, "vid")
        .join(deg, "vid")
        .join(tot.withColumnRenamed("community", "c"), "c")
        .select(
            "vid",
            "community",
            "c",
            (
                F.lit(2 * m) * F.col("k")
                - F.col("deg")
                * (F.col("tot")
                   - F.when(F.col("c") == F.col("community"), F.col("deg"))
                   .otherwise(F.lit(0)))
            ).alias("score_fx"),
        )
    )
    # stay score: k_v→c_v may be 0 (no same-community neighbor) → the
    # kvc row is absent; its score is then −d·(tot_cv − d)
    stay = (
        asg.join(deg, "vid")
        .join(tot, "community")
        .join(
            scored.where(F.col("c") == F.col("community"))
            .select("vid", F.col("score_fx").alias("s0")),
            "vid",
            "left",
        )
        .select(
            "vid",
            "community",
            F.coalesce(
                "s0",
                -F.col("deg") * (F.col("tot") - F.col("deg")),
            ).alias("stay_fx"),
        )
    )
    # tie-break = smallest community id among max-score candidates,
    # expressed as min_by over (−score, c) so it works for ANY
    # community type (string hosts included — negating c would not)
    best = (
        scored.where(F.col("c") != F.col("community"))
        .groupBy("vid")
        .agg(
            F.max("score_fx").alias("best_fx"),
            F.min_by(
                F.col("c"), F.struct(-F.col("score_fx"), F.col("c"))
            ).alias("best_c"),
        )
    )
    return (
        stay.join(best, "vid", "left")
        .select(
            "vid",
            F.when(
                F.col("best_fx") > F.col("stay_fx"), F.col("best_c")
            ).otherwise(F.col("community")).alias("community"),
        )
    )


def bibliographic_coupling(
    edges: DataFrame,
    min_common: int = 2,
    max_in_degree: int | None = 64,
) -> DataFrame:
    """Bibliographic coupling (Kessler 1963): two SOURCES are similar
    when they link to many of the same targets — :func:`cocitation`'s
    exact transpose (same candidate-join plan on reversed edges), the
    complementary related-page signal (coupling looks at what a page
    cites; co-citation at who cites it). Returns
    (a, b, common, jaccard_ppm) over out-neighbor sets; the hub cap
    here bounds TARGET in-degree (a 10⁶-in-degree target creates k²
    coupled pairs)."""
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    return cocitation(rev, min_common=min_common,
                      max_out_degree=max_in_degree)


def link_prediction(
    edges: DataFrame,
    k: int = 50,
    max_degree: int = 256,
) -> DataFrame:
    """Top-k link predictions with the three classic neighbor-overlap
    scores side by side (Liben-Nowell & Kleinberg 2003) over the
    undirected simple graph: for each unlinked pair (u, w) sharing
    ≥1 neighbor —

    - ``common``       |N(u) ∩ N(w)|
    - ``jaccard_ppm``  ⌊10⁶·|N∩| / |N∪|⌋
    - ``ra_ppm``       Σ_{z∈N∩} ⌊10⁶ / deg(z)⌋ (resource allocation,
                       Zhou et al. 2009 — Adamic-Adar with 1/deg
                       instead of 1/ln deg)
    - ``pref_attach``  deg(u)·deg(w)

    Everything is exact integer arithmetic (the harmonic_ppm
    convention), so the DuckDB oracle hash-matches bit-for-bit — no
    float-summation-order hazard at all.

    ``max_degree`` caps the shared-neighbor degree (the adamic_adar
    hub-cap contract: a 10⁶-degree hub contributes 10¹² pairs of
    ~zero score; dropping it bounds the self-join at cap² rows per
    center). Degrees in jaccard/pref_attach are TRUE degrees — the cap
    only prunes pair *generation*. Ranking: common desc, ra_ppm desc,
    (u, w); plans as TakeOrderedAndProject."""
    sym = _sym_edges(edges)
    deg = sym.groupBy(F.col("src").alias("z")).agg(F.count(F.lit(1)).alias("dz"))
    centers = deg.where((F.col("dz") >= 2) & (F.col("dz") <= max_degree))
    a = sym.select(F.col("src").alias("z"), F.col("dst").alias("u"))
    b = sym.select(F.col("src").alias("z"), F.col("dst").alias("w"))
    pairs = (
        a.join(b, "z")
        .where(F.col("u") < F.col("w"))
        .join(centers, "z")
        .groupBy("u", "w")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum(F.expr("1000000 div dz")).cast("long").alias("ra_ppm"),
        )
    )
    unlinked = pairs.join(
        sym.select(F.col("src").alias("u"), F.col("dst").alias("w")),
        ["u", "w"],
        "left_anti",
    )
    du = deg.select(F.col("z").alias("u"), F.col("dz").alias("du"))
    dw = deg.select(F.col("z").alias("w"), F.col("dz").alias("dw"))
    scored = (
        unlinked.join(du, "u")
        .join(dw, "w")
        .select(
            "u",
            "w",
            F.col("common").cast("long").alias("common"),
            F.expr("(1000000 * common) div (du + dw - common)")
            .cast("long")
            .alias("jaccard_ppm"),
            "ra_ppm",
            (F.col("du") * F.col("dw")).cast("long").alias("pref_attach"),
        )
    )
    return scored.orderBy(
        F.desc("common"), F.desc("ra_ppm"), "u", "w"
    ).limit(k)


def link_prediction_sql(
    edges_cte: str, k: int = 50, max_degree: int = 256
) -> str:
    """DuckDB twin of :func:`link_prediction` over an ``edges(src,
    dst)`` CTE (symmetrization included here)."""
    return (
        f"WITH {edges_cte}, "
        "sym AS (SELECT src, dst FROM (SELECT src, dst FROM edges WHERE"
        " src <> dst UNION SELECT dst, src FROM edges WHERE src <> dst)), "
        "deg AS (SELECT src AS z, COUNT(*) AS dz FROM sym GROUP BY src), "
        "pairs AS (SELECT a.dst AS u, b.dst AS w, COUNT(*) AS common,"
        " CAST(SUM(1000000 // d.dz) AS BIGINT) AS ra_ppm"
        " FROM sym a JOIN sym b ON b.src = a.src AND a.dst < b.dst"
        f" JOIN deg d ON d.z = a.src AND d.dz BETWEEN 2 AND {max_degree}"
        " GROUP BY a.dst, b.dst), "
        "unlinked AS (SELECT p.* FROM pairs p LEFT JOIN sym e"
        " ON e.src = p.u AND e.dst = p.w WHERE e.src IS NULL) "
        "SELECT x.u, x.w, CAST(x.common AS BIGINT) AS common,"
        " CAST((1000000 * x.common) // (du.dz + dw.dz - x.common)"
        " AS BIGINT) AS jaccard_ppm, x.ra_ppm,"
        " CAST(du.dz * dw.dz AS BIGINT) AS pref_attach"
        " FROM unlinked x JOIN deg du ON du.z = x.u"
        " JOIN deg dw ON dw.z = x.w"
        f" ORDER BY common DESC, ra_ppm DESC, u, w LIMIT {k}"
    )


def path2_reach(
    edges: DataFrame,
    k: int = 50,
    max_degree: int = 256,
) -> DataFrame:
    """Top-k ordered pairs by 2-step reachability on the DIRECTED
    graph: n_paths(a, b) = |{m : a→m→b}|, a ≠ b. Completes the 2-hop
    family — co-citation is in∩in, bibliographic coupling is out∩out,
    this is out→in composition (one step of A², the building block of
    2-hop reachability indexes / friend-of-friend expansion).

    The middle vertex m contributes indeg(m)·outdeg(m) pairs, so the
    hub cap applies to BOTH of m's degrees before the join (same
    safe-by-default contract as cocitation's max_out_degree). Plan:
    dedup → cap semi-join on m → in⋈out keyed by m (never all-pairs)
    → one partial-agg COUNT per (a, b). Ranking: n_paths desc, (a, b).
    """
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    degs = (
        e.groupBy(F.col("dst").alias("m")).agg(F.count(F.lit(1)).alias("ind"))
        .join(
            e.groupBy(F.col("src").alias("m")).agg(
                F.count(F.lit(1)).alias("outd")
            ),
            "m",
        )
        .where((F.col("ind") <= max_degree) & (F.col("outd") <= max_degree))
        .select("m")
    )
    inc = e.select(F.col("src").alias("a"), F.col("dst").alias("m")).join(degs, "m")
    out = e.select(F.col("src").alias("m"), F.col("dst").alias("b"))
    return (
        inc.join(out, "m")
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
        .orderBy(F.desc("n_paths"), "a", "b")
        .limit(k)
    )


def path2_reach_sql(edges_cte: str, k: int = 50, max_degree: int = 256) -> str:
    """DuckDB twin of :func:`path2_reach`."""
    return (
        f"WITH {edges_cte}, "
        "e AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst), "
        "mid AS (SELECT i.m FROM"
        " (SELECT dst AS m, COUNT(*) AS ind FROM e GROUP BY dst) i"
        " JOIN (SELECT src AS m, COUNT(*) AS outd FROM e GROUP BY src) o"
        f" ON o.m = i.m WHERE i.ind <= {max_degree}"
        f" AND o.outd <= {max_degree}) "
        "SELECT x.src AS a, y.dst AS b, CAST(COUNT(*) AS BIGINT) AS n_paths"
        " FROM e x JOIN mid ON mid.m = x.dst"
        " JOIN e y ON y.src = x.dst WHERE x.src <> y.dst"
        f" GROUP BY x.src, y.dst ORDER BY n_paths DESC, a, b LIMIT {k}"
    )


def rich_club(
    edges: DataFrame,
    thresholds: tuple[int, ...] = (1, 2, 4, 8, 16, 32, 64, 128),
) -> DataFrame:
    """Rich-club coefficient φ(k) (Zhou & Mondragón 2004) over the
    undirected simple graph at the given degree thresholds: among the
    n_k vertices with degree > k, φ(k) = 2·E_k / (n_k·(n_k−1)) where
    E_k counts edges with BOTH endpoints in the club — "do hubs link
    to each other more than chance?", the webgraph core-periphery
    diagnostic. Result: (k, n_club, club_edges, phi_ppm) with
    phi_ppm = ⌊10⁶·2·E_k / (n_k(n_k−1))⌋; thresholds whose club has
    <2 members report phi_ppm 0.

    Plan: one degree agg, then a broadcast of the |thresholds|-row
    threshold table against the degree and edge tables — O(V·K + E·K)
    with K = 8, all partial-agg; no per-threshold job, no driver loop.
    """
    sym = _sym_edges(edges)
    und = sym.where(F.col("src") < F.col("dst"))
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    spark = edges.sparkSession
    ks = spark.createDataFrame([(int(k),) for k in thresholds], "k long")
    club_n = (
        deg.join(F.broadcast(ks), F.col("deg") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_club"))
    )
    du = deg.select(F.col("id").alias("src"), F.col("deg").alias("ds"))
    dv = deg.select(F.col("id").alias("dst"), F.col("deg").alias("dd"))
    club_e = (
        und.join(du, "src")
        .join(dv, "dst")
        .join(
            F.broadcast(ks),
            (F.col("ds") > F.col("k")) & (F.col("dd") > F.col("k")),
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("club_edges"))
    )
    return (
        F.broadcast(ks).join(club_n, "k", "left")
        .join(club_e, "k", "left")
        .select(
            "k",
            F.coalesce("n_club", F.lit(0)).cast("long").alias("n_club"),
            F.coalesce("club_edges", F.lit(0)).cast("long")
            .alias("club_edges"),
        )
        .withColumn(
            "phi_ppm",
            F.when(
                F.col("n_club") >= 2,
                F.expr(
                    "(2000000 * club_edges) div (n_club * (n_club - 1))"
                ),
            ).otherwise(F.lit(0)).cast("long"),
        )
    )


def rich_club_sql(
    edges_cte: str,
    thresholds: tuple[int, ...] = (1, 2, 4, 8, 16, 32, 64, 128),
) -> str:
    """DuckDB twin of :func:`rich_club`."""
    ks = ", ".join(f"({int(k)})" for k in thresholds)
    return (
        f"WITH {edges_cte}, "
        "sym AS (SELECT src, dst FROM (SELECT src, dst FROM edges WHERE"
        " src <> dst UNION SELECT dst, src FROM edges WHERE src <> dst)), "
        "und AS (SELECT src, dst FROM sym WHERE src < dst), "
        "deg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY src), "
        f"ks(k) AS (VALUES {ks}), "
        "cn AS (SELECT k, COUNT(*) AS n_club FROM deg JOIN ks"
        " ON deg.deg > ks.k GROUP BY k), "
        "ce AS (SELECT k, COUNT(*) AS club_edges FROM und"
        " JOIN deg du ON du.id = und.src"
        " JOIN deg dv ON dv.id = und.dst"
        " JOIN ks ON du.deg > ks.k AND dv.deg > ks.k GROUP BY k) "
        "SELECT CAST(ks.k AS BIGINT) AS k,"
        " CAST(COALESCE(cn.n_club, 0) AS BIGINT) AS n_club,"
        " CAST(COALESCE(ce.club_edges, 0) AS BIGINT) AS club_edges,"
        " CAST(CASE WHEN COALESCE(cn.n_club, 0) >= 2 THEN"
        " (2000000 * COALESCE(ce.club_edges, 0)) //"
        " (cn.n_club * (cn.n_club - 1)) ELSE 0 END AS BIGINT) AS phi_ppm"
        " FROM ks LEFT JOIN cn ON cn.k = ks.k LEFT JOIN ce ON ce.k = ks.k"
    )


def edge_embeddedness(edges: DataFrame) -> DataFrame:
    """Embeddedness of every undirected edge — |N(u) ∩ N(v)|, the
    number of common neighbors of its endpoints — plus the *local
    bridge* flag (embeddedness 0): Granovetter's tie-strength
    structure (Easley & Kleinberg ch. 3). On a web/link graph local
    bridges are the cross-community links — removing one raises its
    endpoints' distance above 2 — so this is the edge-level complement
    of the vertex-level clustering coefficient above.

    Computation: common neighbors of (u,v) = triangles THROUGH the
    edge, counted on the degree-ordered orientation (each triangle
    found exactly once as a wedge a<b<c, then credited to all three of
    its edges) — the row count is O(#triangles) + O(E), never the
    quadratic common-neighbor join. A left join back to the undirected
    edge list keeps zero-embeddedness edges (the bridges).

    Result: (src, dst, embeddedness, is_local_bridge) with src < dst.
    """
    sym = _sym_edges(edges)
    und = sym.where(F.col("src") < F.col("dst"))
    fwd = _oriented(sym)
    a = fwd.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    b = fwd.select(F.col("src").alias("a2"), F.col("dst").alias("c"))
    # both (b,c) orders are wedge-enumerated; the closing-edge join
    # keeps exactly one (fwd is a DAG orientation — one direction of
    # every undirected edge exists), so each triangle lands once
    wedges = a.join(b, F.col("a") == F.col("a2"))
    closing = fwd.select(
        F.col("src").alias("b"), F.col("dst").alias("c")
    )
    tri = wedges.join(closing, ["b", "c"]).select("a", "b", "c")
    # credit each triangle to its three edges, canonical (lo, hi)
    per_edge = (
        tri.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .unionAll(tri.select(F.col("a").alias("x"), F.col("c").alias("y")))
        .unionAll(tri.select(F.col("b").alias("x"), F.col("c").alias("y")))
        .select(
            F.least("x", "y").alias("src"), F.greatest("x", "y").alias("dst")
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("emb"))
    )
    return und.join(per_edge, ["src", "dst"], "left").select(
        "src",
        "dst",
        F.coalesce("emb", F.lit(0)).cast("long").alias("embeddedness"),
        (F.coalesce("emb", F.lit(0)) == 0).alias("is_local_bridge"),
    )


def edge_embeddedness_sql(edges_cte: str) -> str:
    """DuckDB twin of :func:`edge_embeddedness` (the oracle counts
    common neighbors directly — same numbers, simpler plan at oracle
    scale)."""
    return (
        f"WITH {edges_cte}, "
        "sym AS (SELECT src, dst FROM (SELECT src, dst FROM edges WHERE"
        " src <> dst UNION SELECT dst, src FROM edges WHERE src <> dst)), "
        "und AS (SELECT src, dst FROM sym WHERE src < dst), "
        "cn AS (SELECT u.src, u.dst, COUNT(*) AS emb FROM und u "
        "JOIN sym x ON x.src = u.src JOIN sym y ON y.src = u.dst "
        "AND y.dst = x.dst GROUP BY u.src, u.dst) "
        "SELECT u.src, u.dst, "
        "CAST(COALESCE(cn.emb, 0) AS BIGINT) AS embeddedness, "
        "COALESCE(cn.emb, 0) = 0 AS is_local_bridge "
        "FROM und u LEFT JOIN cn ON cn.src = u.src AND cn.dst = u.dst"
    )


def avg_neighbor_degree(edges: DataFrame) -> DataFrame:
    """Average nearest-neighbor degree knn(v) (Pastor-Satorras et al.
    2001) in exact integer quotients — the per-vertex form of degree
    assortativity (:func:`degree_correlation` is the global scalar):
    knn_ppm(v) = ⌊10⁶ · Σ_{u~v} deg(u) / deg(v)⌋ on the undirected
    simple graph. Hub-avoiding webgraphs (disassortative) show knn
    falling with deg — the classic k vs knn(k) diagnostic.

    One degree agg + one scatter join + one partial-agg sum — the
    pagerank superstep shape, run once. Result: (vid, deg, knn_ppm).
    """
    sym = _sym_edges(edges)
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    nsum = (
        sym.join(
            deg.select(F.col("id").alias("dst"), F.col("deg").alias("nd")),
            "dst",
        )
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum("nd").alias("s"))
    )
    return (
        deg.join(nsum, "id")
        .select(
            F.col("id").alias("vid"),
            F.col("deg").cast("long").alias("deg"),
            F.expr("(1000000 * s) div deg").cast("long").alias("knn_ppm"),
        )
    )


def avg_neighbor_degree_sql(edges_cte: str) -> str:
    """DuckDB twin of :func:`avg_neighbor_degree`."""
    return (
        f"WITH {edges_cte}, "
        "sym AS (SELECT src, dst FROM (SELECT src, dst FROM edges WHERE"
        " src <> dst UNION SELECT dst, src FROM edges WHERE src <> dst)), "
        "deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg"
        " FROM sym GROUP BY src), "
        "nsum AS (SELECT s.src AS id, CAST(SUM(d.deg) AS BIGINT) AS s"
        " FROM sym s JOIN deg d ON d.id = s.dst GROUP BY s.src) "
        "SELECT deg.id AS vid, deg.deg, "
        "CAST((1000000 * nsum.s) // deg.deg AS BIGINT) AS knn_ppm "
        "FROM deg JOIN nsum ON nsum.id = deg.id"
    )


def temporal_reach(
    edges: DataFrame,
    hops: int = 3,
    max_degree: int = 256,
    ts_col: str = "ts",
) -> DataFrame:
    """Time-respecting reachability (Kempe, Kleinberg & Kumar 2000;
    Holme & Saramäki's temporal-network reach): vertex b is reachable
    from a within ``hops`` steps iff a path a→…→b exists whose edge
    timestamps are NON-DECREASING — links can only relay information
    forward in time. On webgraphs this is citation/crawl-frontier
    propagation: a page discovered at time t can only lead the crawler
    to links that still exist at ≥ t. The static composition
    (path2_reach) overcounts exactly the pairs whose connecting path is
    chronologically impossible.

    Exactness device: earliest-arrival DOMINATES — if b is reachable
    with some arrival time, it is reachable with its minimal one, and
    any extension legal from a later arrival is legal from an earlier
    one. So the state is one (src, v, arrival) row per reached vertex
    with arrival = MIN, a pure min-combine fixpoint (the CC/SSSP
    convention) unrolled to ``hops`` levels — deterministic, integral,
    hash-exact vs the unrolled-CTE twin.

    ``max_degree`` caps relay vertices on BOTH degrees before the walk
    (path2_reach's safe-by-default hub contract — a 10⁶-degree hub
    as a relay step is a candidate-set bomb at 100 TB).

    Result: (src, n_reached) — distinct vertices reachable in 1..hops
    time-respecting steps (self excluded unless on a cycle).

    Plan per hop: frontier ⋈ capped edges on the relay key, partial-agg
    MIN per (src, v) — the landmark-BFS shape with a timestamp
    predicate; nothing touches Python.
    """
    e = (
        edges.select("src", "dst", F.col(ts_col).cast("long").alias("ts"))
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("ts").alias("ts"))
    )
    ecnt = e.select("src", "dst")
    degs = (
        ecnt.groupBy(F.col("dst").alias("m")).agg(F.count(F.lit(1)).alias("ind"))
        .join(
            ecnt.groupBy(F.col("src").alias("m")).agg(
                F.count(F.lit(1)).alias("outd")
            ),
            "m",
        )
        .where((F.col("ind") <= max_degree) & (F.col("outd") <= max_degree))
        .select("m")
    )
    # hop 1: every (src, dst, ts) edge row is a reach with arrival ts
    state = e.groupBy("src", F.col("dst").alias("v")).agg(
        F.min("ts").alias("arrival")
    )
    for _ in range(1, hops):
        ext = (
            state.join(degs, state["v"] == degs["m"]).drop("m")
            .join(e.select(F.col("src").alias("v"), F.col("dst").alias("w"), "ts"), "v")
            .where(F.col("ts") >= F.col("arrival"))
            .select("src", F.col("w").alias("v"), F.col("ts").alias("arrival"))
        )
        state = (
            state.unionAll(ext)
            .groupBy("src", "v")
            .agg(F.min("arrival").alias("arrival"))
        )
    return (
        state.where(F.col("src") != F.col("v"))
        .groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("n_reached"))
    )


def temporal_reach_sql(
    edges_cte: str,
    hops: int = 3,
    max_degree: int = 256,
) -> str:
    """DuckDB twin of :func:`temporal_reach` — unrolled min-combine
    levels over an ``edges(src, dst, ts)`` CTE."""
    ctes = [
        f"WITH {edges_cte}",
        "e AS (SELECT src, dst, CAST(MIN(ts) AS BIGINT) AS ts FROM edges"
        " WHERE src <> dst GROUP BY src, dst)",
        "mid AS (SELECT i.m FROM"
        " (SELECT dst AS m, COUNT(*) AS ind FROM e GROUP BY dst) i"
        " JOIN (SELECT src AS m, COUNT(*) AS outd FROM e GROUP BY src) o"
        f" ON o.m = i.m WHERE i.ind <= {max_degree}"
        f" AND o.outd <= {max_degree})",
    ]
    ctes.append(
        "s1 AS (SELECT src, dst AS v, CAST(MIN(ts) AS BIGINT) AS arrival"
        " FROM e GROUP BY src, dst)"
    )
    for h in range(2, hops + 1):
        ctes.append(
            f"s{h} AS (SELECT src, v, CAST(MIN(arrival) AS BIGINT)"
            f" AS arrival FROM ("
            f" SELECT src, v, arrival FROM s{h-1}"
            f" UNION ALL"
            f" SELECT p.src, e.dst AS v, e.ts AS arrival FROM s{h-1} p"
            f" JOIN mid ON mid.m = p.v"
            f" JOIN e ON e.src = p.v WHERE e.ts >= p.arrival"
            f") GROUP BY src, v)"
        )
    return (
        ", ".join(ctes)
        + f" SELECT src, CAST(COUNT(*) AS BIGINT) AS n_reached FROM s{hops}"
        " WHERE src <> v GROUP BY src"
    )


def butterflies(
    edges: DataFrame,
    k: int = 50,
    max_left_degree: int = 64,
) -> DataFrame:
    """Per-right-vertex butterfly counts on a bipartite graph — the
    butterfly (2×2 biclique, C₄) is the bipartite analogue of the
    triangle and the base motif of bipartite clustering/community
    metrics (Sanei-Mehri, Sariyüce & Tirthapura, KDD 2018). For right
    vertices p ≠ q sharing m left neighbors, the pair closes C(m,2)
    butterflies; bf(p) = Σ_q C(m_pq, 2).

    ``max_left_degree`` caps LEFT-side wedge generators before the
    pair join (a left vertex of degree d emits C(d,2) right pairs —
    the candidate-set bomb; same safe-by-default contract as the
    capped n-gram/cocitation paths — and the cap is the standard
    practice for this motif at web scale).

    Result: top-``k`` (vid, n_butterflies) by count desc then vid.
    Plan: degree cap semi-join → one self-join keyed by the left
    vertex (never right×right all-pairs) → partial-agg pair counts →
    per-vertex agg → TakeOrderedAndProject. Integer throughout.
    """
    e = edges.select("src", "dst").distinct()
    keep = (
        e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        .where(F.col("d") <= max_left_degree)
        .select("src")
    )
    ec = e.join(keep, "src")
    pairs = (
        ec.select("src", F.col("dst").alias("p"))
        .join(ec.select("src", F.col("dst").alias("q")), "src")
        .where(F.col("p") < F.col("q"))
        .groupBy("p", "q")
        .agg(F.count(F.lit(1)).alias("m"))
        .where(F.col("m") >= 2)
        .select("p", "q", F.expr("(m * (m - 1)) div 2").cast("long").alias("bf"))
    )
    per_vertex = (
        pairs.select(F.col("p").alias("vid"), "bf")
        .unionAll(pairs.select(F.col("q").alias("vid"), "bf"))
        .groupBy("vid")
        .agg(F.sum("bf").cast("long").alias("n_butterflies"))
    )
    return per_vertex.orderBy(F.desc("n_butterflies"), "vid").limit(k)


def butterflies_sql(
    edges_cte: str, k: int = 50, max_left_degree: int = 64
) -> str:
    """DuckDB twin of :func:`butterflies`."""
    return (
        f"WITH {edges_cte}, "
        "e0 AS (SELECT DISTINCT src, dst FROM edges), "
        "keep AS (SELECT src FROM (SELECT src, COUNT(*) AS d FROM e0"
        f" GROUP BY src) WHERE d <= {max_left_degree}), "
        "ec AS (SELECT e0.src, e0.dst FROM e0 JOIN keep ON keep.src = e0.src), "
        "pairs AS (SELECT a.dst AS p, b.dst AS q, COUNT(*) AS m"
        " FROM ec a JOIN ec b ON a.src = b.src AND a.dst < b.dst"
        " GROUP BY a.dst, b.dst HAVING COUNT(*) >= 2), "
        "bf AS (SELECT p, q, CAST(m * (m - 1) // 2 AS BIGINT) AS bf"
        " FROM pairs), "
        "pv AS (SELECT vid, CAST(SUM(bf) AS BIGINT) AS n_butterflies FROM"
        " (SELECT p AS vid, bf FROM bf UNION ALL SELECT q, bf FROM bf)"
        " GROUP BY vid) "
        f"SELECT vid, n_butterflies FROM pv"
        f" ORDER BY n_butterflies DESC, vid LIMIT {k}"
    )


def degree_gini(edges: DataFrame) -> DataFrame:
    """Hub-concentration audit: the Gini coefficient of the out-degree
    distribution over ALL vertices (sinks count with out-degree 0) →
    one row (n_vertices, total_degree, gini), gini rounded to 6. Web
    link graphs run extremely unequal (gini → 1 as hubs dominate); a
    crawl shard whose gini collapses toward 0 is usually a spider trap
    emitting uniform synthetic pages, so this pairs with
    url_templates as a crawl-health gate.

    Computed from the DEGREE HISTOGRAM, never a per-vertex global
    sort-rank: vertices with degree d occupy the consecutive ascending
    ranks (cum_before, cum], whose rank-sum is closed-form
    (lo+hi)·cnt/2 — so the only window runs over the tiny (degree →
    count) histogram, O(distinct degrees) rows at any graph size. All
    terms stay exact integers until the final two IEEE divides."""
    from pyspark.sql import Window

    outdeg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    v = (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    deg = v.join(outdeg, "id", "left").select(
        F.coalesce("d", F.lit(0)).cast("long").alias("d")
    )
    hist = deg.groupBy("d").agg(F.count(F.lit(1)).alias("m"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("m").over(w))
    # ranks of the degree-d block: (cum-m, cum]; sum = (lo+hi)*cnt/2
    rank_sum = F.expr("((cum - m + 1 + cum) * m) div 2")
    agg = cum.agg(
        F.sum("m").cast("long").alias("n"),
        F.sum(F.col("d") * F.col("m")).cast("long").alias("total"),
        F.sum(F.col("d") * rank_sum).cast("long").alias("weighted"),
    )
    gini = (
        F.lit(2.0) * F.col("weighted").cast("double")
        / (F.col("n") * F.col("total")).cast("double")
        - (F.col("n") + 1).cast("double") / F.col("n").cast("double")
    )
    return agg.select(
        F.col("n").alias("n_vertices"),
        F.col("total").alias("total_degree"),
        F.round(gini, 6).alias("gini"),
    )


def degree_gini_sql(edges_cte: str) -> str:
    """DuckDB twin of :func:`degree_gini` — same histogram closed form."""
    return (
        f"WITH {edges_cte}, "
        "outdeg AS (SELECT src AS id, COUNT(*) AS d FROM edges GROUP BY src), "
        "v AS (SELECT DISTINCT id FROM (SELECT src AS id FROM edges "
        "UNION ALL SELECT dst FROM edges)), "
        "deg AS (SELECT CAST(COALESCE(o.d, 0) AS BIGINT) AS d "
        "FROM v LEFT JOIN outdeg o ON v.id = o.id), "
        "hist AS (SELECT d, COUNT(*) AS m FROM deg GROUP BY d), "
        "cums AS (SELECT d, m, SUM(m) OVER (ORDER BY d) AS cum FROM hist), "
        "agg AS (SELECT CAST(SUM(m) AS BIGINT) AS n, "
        "CAST(SUM(d * m) AS BIGINT) AS total, "
        "CAST(SUM(d * ((cum - m + 1 + cum) * m // 2)) AS BIGINT) AS weighted "
        "FROM cums) "
        "SELECT n AS n_vertices, total AS total_degree, "
        "ROUND(2.0 * CAST(weighted AS DOUBLE) / CAST(n * total AS DOUBLE) "
        "- CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gini FROM agg"
    )


def clustering_spectrum(edges: DataFrame) -> DataFrame:
    """Clustering spectrum C(k): the *degree-class* clustering
    coefficient — Σ 2·T(v) over vertices of degree k divided by
    Σ k·(k−1) — in exact ppm. A falling C(k) is the standard
    hierarchical-modularity signature of real webgraphs (Ravasz &
    Barabási 2003); a flat one means the triangles are degree-random.

    Value-space output (one row per distinct degree), exact integers
    end to end: (deg, n_vertices, tri_sum, cc_ppm)."""
    sym = _sym_edges(edges)
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    t = vertex_triangles(edges)
    per_v = deg.join(t, "id", "left").select(
        "deg", F.coalesce("n_triangles", F.lit(0)).alias("t")
    )
    return (
        per_v.groupBy("deg")
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.sum("t").cast("long").alias("tri_sum"),
        )
        .select(
            "deg",
            "n_vertices",
            "tri_sum",
            F.when(
                F.col("deg") >= 2,
                F.expr(
                    "(2 * tri_sum * 1000000) DIV "
                    "(n_vertices * deg * (deg - 1))"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("cc_ppm"),
        )
    )


def clustering_spectrum_sql(edges_cte: str) -> str:
    """DuckDB twin of :func:`clustering_spectrum` — id-order triangle
    corner credits (equal by symmetry to the orientation's)."""
    return (
        f"WITH {edges_cte}, "
        "sym AS (SELECT src, dst FROM (SELECT src, dst FROM edges WHERE"
        " src <> dst UNION SELECT dst, src FROM edges WHERE src <> dst)), "
        "deg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY src), "
        # the (v,u,w) u<w per-corner enumeration visits every corner of
        # every triangle exactly once — COUNT per v IS T(v) (the
        # clustering_coefficient oracle's device)
        "t AS (SELECT e1.src AS id, COUNT(*) AS t "
        "FROM sym e1 JOIN sym e2 ON e2.src = e1.src AND e1.dst < e2.dst "
        "JOIN sym e3 ON e3.src = e1.dst AND e3.dst = e2.dst "
        "GROUP BY e1.src), "
        "pv AS (SELECT deg.deg, COALESCE(t.t, 0) AS t FROM deg "
        "LEFT JOIN t ON deg.id = t.id), "
        "spec AS (SELECT deg, COUNT(*) AS n_vertices, "
        "CAST(SUM(t) AS BIGINT) AS tri_sum FROM pv GROUP BY deg) "
        "SELECT deg, n_vertices, tri_sum, "
        "CAST(CASE WHEN deg >= 2 THEN (2 * tri_sum * 1000000) // "
        "(n_vertices * deg * (deg - 1)) ELSE 0 END AS BIGINT) AS cc_ppm "
        "FROM spec"
    )


def dispersion(
    edges: DataFrame,
    cn_cap: int = 64,
) -> DataFrame:
    """Backstrom–Kleinberg *dispersion* of every embedded edge: for an
    undirected edge (u,v) with common-neighbor set C(u,v), dispersion
    is the number of pairs {s,t} ⊆ C(u,v) that are NOT themselves
    adjacent (the direct-link variant of the original recursive
    definition). High dispersion = the endpoints' shared contacts are
    spread across otherwise-disconnected contexts — the tie-strength
    signal that beat embeddedness for romantic-partner prediction in
    the original paper; on a host graph it separates genuine
    cross-context affiliations from single-clique co-membership.
    Complements :func:`edge_embeddedness` (which only counts |C|).

    Blowup control (same contract as pmi_pairs' per_doc_cap): each
    edge contributes only its ``cn_cap`` smallest common neighbors to
    the pair join — cap²/2 pairs per edge, a hard bound independent of
    hub degree, and the capped count is reported so the statistic is
    self-consistent. Only edges with ≥2 (capped) common neighbors are
    emitted — dispersion is identically 0 elsewhere.

    Result: (src, dst, cn_capped, dispersion) with src < dst, exact
    integers. Reference parity: DRONE has no dispersion operator; this
    extends its triangle/embeddedness family (see vertex_triangles).
    """
    sym = _sym_edges(edges)
    und = sym.where(F.col("src") < F.col("dst"))
    # common neighbors per edge: w adjacent to both endpoints.
    # Row count = 3·#triangles (each triangle credits all 3 edges).
    cn = (
        und.join(
            sym.select(F.col("src").alias("u"), F.col("dst").alias("w")),
            F.col("src") == F.col("u"),
        )
        .join(
            sym.select(F.col("src").alias("v"), F.col("dst").alias("w2")),
            (F.col("dst") == F.col("v")) & (F.col("w") == F.col("w2")),
        )
        .select("src", "dst", "w")
    )
    rn = Window.partitionBy("src", "dst").orderBy("w")
    capped = (
        cn.withColumn("rn", F.row_number().over(rn))
        .where(F.col("rn") <= cn_cap)
        .select("src", "dst", "w")
    )
    counts = capped.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("cn_capped")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    pairs = a.join(
        b,
        (F.col("a.src") == F.col("b.src"))
        & (F.col("a.dst") == F.col("b.dst"))
        & (F.col("a.w") < F.col("b.w")),
    ).select(
        F.col("a.src").alias("src"),
        F.col("a.dst").alias("dst"),
        F.col("a.w").alias("s"),
        F.col("b.w").alias("t"),
    )
    # drop pairs whose members are directly linked (s<t canonical in sym/und)
    open_pairs = pairs.join(
        und.select(F.col("src").alias("s"), F.col("dst").alias("t")),
        ["s", "t"],
        "left_anti",
    )
    disp = open_pairs.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("dispersion")
    )
    return (
        counts.where(F.col("cn_capped") >= 2)
        .join(disp, ["src", "dst"], "left")
        .select(
            "src",
            "dst",
            F.col("cn_capped").cast("long").alias("cn_capped"),
            F.coalesce("dispersion", F.lit(0)).cast("long").alias("dispersion"),
        )
    )


def dispersion_sql(edges_cte: str, cn_cap: int = 64) -> str:
    """DuckDB twin of :func:`dispersion`."""
    return (
        f"WITH {edges_cte}, "
        "sym AS (SELECT src, dst FROM (SELECT src, dst FROM edges WHERE"
        " src <> dst UNION SELECT dst, src FROM edges WHERE src <> dst)), "
        "und AS (SELECT src, dst FROM sym WHERE src < dst), "
        "cn AS (SELECT u.src, u.dst, x.dst AS w FROM und u "
        "JOIN sym x ON x.src = u.src JOIN sym y ON y.src = u.dst "
        "AND y.dst = x.dst), "
        "capped AS (SELECT src, dst, w FROM (SELECT src, dst, w, "
        "ROW_NUMBER() OVER (PARTITION BY src, dst ORDER BY w) AS rn "
        f"FROM cn) WHERE rn <= {cn_cap}), "
        "counts AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS cn_capped "
        "FROM capped GROUP BY src, dst), "
        "pairs AS (SELECT a.src, a.dst, a.w AS s, b.w AS t FROM capped a "
        "JOIN capped b ON a.src = b.src AND a.dst = b.dst AND a.w < b.w), "
        "open_pairs AS (SELECT p.src, p.dst FROM pairs p LEFT JOIN und e "
        "ON e.src = p.s AND e.dst = p.t WHERE e.src IS NULL), "
        "disp AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS dispersion "
        "FROM open_pairs GROUP BY src, dst) "
        "SELECT c.src, c.dst, c.cn_capped, "
        "CAST(COALESCE(d.dispersion, 0) AS BIGINT) AS dispersion "
        "FROM counts c LEFT JOIN disp d ON d.src = c.src AND d.dst = c.dst "
        "WHERE c.cn_capped >= 2"
    )


RETURN3_SCALE = 1_000_000_000


def walk_return3(edges: DataFrame, max_degree: int = 4096) -> DataFrame:
    """3-step random-walk return probability per vertex — the diagonal
    of P³ for the uniform walk on the undirected simple graph. A
    length-3 closed walk v→a→b→v exists iff {v,a,b} is a triangle, so
    this is the WALK-WEIGHTED triangle profile: each triangle through
    v contributes 2/(deg v·deg a·deg b) (two orientations). High
    return₃ marks tight low-degree cliques (link farms read hot here);
    the unweighted count is :func:`vertex_triangles` and the
    normalized-by-wedges form :func:`clustering_coefficient` — this
    completes the family with the spectral/walk view (trace P³).

    Exact-integer contract (harmonic_ppm convention): each closed walk
    contributes ⌊10⁹/(dv·da·db)⌋, floored per-walk then summed — no
    float summation order anywhere, bit-identical in both engines.
    ``max_degree`` caps the MIDDLE vertex degree during wedge
    generation (the adamic_adar hub-cap contract; a 10⁶-degree hub's
    walks contribute ~0 anyway). Degrees in the weight are TRUE
    degrees.

    Result: (vid, return3_fx) — only vertices on ≥1 triangle appear.
    """
    sym = _sym_edges(edges)
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    # wedges v→a→b (a the middle), capped on deg(a)
    e1 = sym.select(F.col("src").alias("v"), F.col("dst").alias("a"))
    e2 = sym.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    mid_ok = deg.where(F.col("d") <= max_degree).select(
        F.col("id").alias("a")
    )
    wedges = e1.join(mid_ok, "a").join(e2, "a").where(F.col("b") != F.col("v"))
    closed = wedges.join(
        sym.select(F.col("src").alias("b"), F.col("dst").alias("v")),
        ["b", "v"],
    )
    dv = deg.select(F.col("id").alias("v"), F.col("d").alias("dv"))
    da = deg.select(F.col("id").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("id").alias("b"), F.col("d").alias("db"))
    return (
        closed.join(dv, "v")
        .join(da, "a")
        .join(db, "b")
        .select(
            F.col("v"),
            F.expr(f"{RETURN3_SCALE} div (dv * da * db)").alias("wt"),
        )
        .groupBy(F.col("v").alias("vid"))
        .agg(F.sum("wt").cast("long").alias("return3_fx"))
    )


def walk_return3_sql(edges_cte: str, max_degree: int = 4096) -> str:
    """DuckDB twin of :func:`walk_return3`."""
    return (
        f"WITH {edges_cte}, "
        "sym AS (SELECT src, dst FROM (SELECT src, dst FROM edges WHERE"
        " src <> dst UNION SELECT dst, src FROM edges WHERE src <> dst)), "
        "deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS d "
        "FROM sym GROUP BY src), "
        "closed AS (SELECT e1.src AS v, e1.dst AS a, e2.dst AS b "
        "FROM sym e1 JOIN deg dm ON dm.id = e1.dst "
        f"AND dm.d <= {max_degree} "
        "JOIN sym e2 ON e2.src = e1.dst AND e2.dst <> e1.src "
        "JOIN sym e3 ON e3.src = e2.dst AND e3.dst = e1.src) "
        "SELECT c.v AS vid, CAST(SUM("
        f"{RETURN3_SCALE} // (dv.d * da.d * db.d)) AS BIGINT) AS return3_fx "
        "FROM closed c JOIN deg dv ON dv.id = c.v "
        "JOIN deg da ON da.id = c.a JOIN deg db ON db.id = c.b "
        "GROUP BY c.v"
    )


def molloy_reed(edges: DataFrame) -> DataFrame:
    """Molloy–Reed percolation criterion for the undirected simple
    graph: κ = ⟨k²⟩/⟨k⟩. A configuration-model random graph with this
    degree sequence has a giant component iff κ > 2, and the fraction
    of hubs you must remove to shatter it grows with κ — for power-law
    webgraphs κ is huge, the one-scalar explanation of why the web
    stays connected under random page loss yet falls to targeted hub
    removal (:func:`robustness` measures that empirically; this is
    the closed-form prediction from degree moments alone).

    One degree agg + one 4-value reduce — no join, no iteration.
    Exact-integer quotients (ppm convention). Result: one row
    (n_vertices, mean_deg_ppm, mean_deg2_ppm, kappa_ppm,
    supercritical)."""
    sym = _sym_edges(edges)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    return deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices"),
        F.expr("(1000000 * sum(d)) div count(1)")
        .cast("long")
        .alias("mean_deg_ppm"),
        F.expr("(1000000 * sum(d * d)) div count(1)")
        .cast("long")
        .alias("mean_deg2_ppm"),
        F.expr("(1000000 * sum(d * d)) div sum(d)")
        .cast("long")
        .alias("kappa_ppm"),
        F.expr("sum(d * d) > 2 * sum(d)").alias("supercritical"),
    )


def molloy_reed_sql(edges_cte: str) -> str:
    """DuckDB twin of :func:`molloy_reed`."""
    return (
        f"WITH {edges_cte}, "
        "sym AS (SELECT src, dst FROM (SELECT src, dst FROM edges WHERE"
        " src <> dst UNION SELECT dst, src FROM edges WHERE src <> dst)), "
        "deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d "
        "FROM sym GROUP BY src) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices, "
        "CAST((1000000 * SUM(d)) // COUNT(*) AS BIGINT) AS mean_deg_ppm, "
        "CAST((1000000 * SUM(d * d)) // COUNT(*) AS BIGINT) AS mean_deg2_ppm, "
        "CAST((1000000 * SUM(d * d)) // SUM(d) AS BIGINT) AS kappa_ppm, "
        "SUM(d * d) > 2 * SUM(d) AS supercritical FROM deg"
    )


def inout_correlation(edges: DataFrame) -> DataFrame:
    """Pearson correlation between each vertex's in-degree and
    out-degree on the directed simple graph — the one-scalar
    hub/authority coupling: r ≈ 1 means pages that are linked-to also
    link out (portal-like webs), r ≈ 0 means authorities and hubs are
    disjoint populations (the classic HITS separation). Complements
    :func:`degree_correlation` (edge-endpoint assortativity) with the
    per-VERTEX view.

    All five sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy) are
    exact BIGINTs; the final r takes one sqrt on the exact integer
    discriminants and rounds to 6 — correctly-rounded IEEE sqrt is
    engine-identical. Result: one row (n_vertices, r)."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    outd = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("x")
    )
    ind = e.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("y")
    )
    both = (
        outd.join(ind, "id", "full")
        .select(
            F.coalesce("x", F.lit(0)).alias("x"),
            F.coalesce("y", F.lit(0)).alias("y"),
        )
    )
    agg = both.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return agg.select(
        F.col("n").cast("long").alias("n_vertices"),
        F.round(
            num.cast("double")
            / F.sqrt(dx.cast("double") * dy.cast("double")),
            6,
        ).alias("r"),
    )


def inout_correlation_sql(edges_cte: str) -> str:
    """DuckDB twin of :func:`inout_correlation`."""
    return (
        f"WITH {edges_cte}, "
        "e AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst), "
        "outd AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS x "
        "FROM e GROUP BY src), "
        "ind AS (SELECT dst AS id, CAST(COUNT(*) AS BIGINT) AS y "
        "FROM e GROUP BY dst), "
        "xy AS (SELECT COALESCE(o.x, 0) AS x, COALESCE(i.y, 0) AS y "
        "FROM outd o FULL JOIN ind i ON i.id = o.id), "
        "agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
        "CAST(SUM(x * x) AS BIGINT) AS sxx, "
        "CAST(SUM(y * y) AS BIGINT) AS syy, "
        "CAST(SUM(x * y) AS BIGINT) AS sxy FROM xy) "
        "SELECT n AS n_vertices, "
        "ROUND(CAST(n * sxy - sx * sy AS DOUBLE) / "
        "sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * "
        "CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r FROM agg"
    )


def graph_profile(edges: DataFrame) -> DataFrame:
    """One-row graph describe() — the summary a pipeline logs before
    choosing partitioning/skew strategy: vertex & edge counts (raw
    directed rows, distinct simple edges, self-loops), density in ppb
    (m / n(n−1), directed simple), max/mean degree, and the share of
    edges touching the single highest-degree hub (the salting
    trigger). All exact integers: density uses ppb (10⁹) because web
    graphs live at densities below 1 ppm.

    Result: one row (n_vertices, n_edges_raw, n_edges, n_selfloops,
    density_ppb, max_out_deg, mean_out_deg_ppm, top_hub_share_ppm)."""
    raw = edges.select("src", "dst")
    simple = raw.where(F.col("src") != F.col("dst")).distinct()
    loops = raw.where(F.col("src") == F.col("dst"))
    outd = simple.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    verts = (
        simple.select(F.col("src").alias("id"))
        .unionAll(simple.select(F.col("dst").alias("id")))
        .distinct()
    )
    stats = (
        verts.agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(simple.agg(F.count(F.lit(1)).alias("m")))
        .crossJoin(raw.agg(F.count(F.lit(1)).alias("m_raw")))
        .crossJoin(loops.agg(F.count(F.lit(1)).alias("nl")))
        .crossJoin(outd.agg(F.max("d").alias("dmax")))
    )
    return stats.select(
        F.col("n").cast("long").alias("n_vertices"),
        F.col("m_raw").cast("long").alias("n_edges_raw"),
        F.col("m").cast("long").alias("n_edges"),
        F.col("nl").cast("long").alias("n_selfloops"),
        F.expr("(1000000000 * m) div (n * (n - 1))")
        .cast("long")
        .alias("density_ppb"),
        F.col("dmax").cast("long").alias("max_out_deg"),
        F.expr("(1000000 * m) div n").cast("long").alias("mean_out_deg_ppm"),
        F.expr("(1000000 * dmax) div m").cast("long").alias(
            "top_hub_share_ppm"
        ),
    )


def graph_profile_sql(edges_cte: str) -> str:
    """DuckDB twin of :func:`graph_profile` (edges CTE may contain
    duplicate/self-loop rows — the profile reports both views)."""
    return (
        f"WITH {edges_cte}, "
        "simple AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst), "
        "outd AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d "
        "FROM simple GROUP BY src), "
        "stats AS (SELECT "
        "(SELECT COUNT(*) FROM (SELECT src AS id FROM simple "
        "UNION SELECT dst FROM simple)) AS n, "
        "(SELECT COUNT(*) FROM simple) AS m, "
        "(SELECT COUNT(*) FROM edges) AS m_raw, "
        "(SELECT COUNT(*) FROM edges WHERE src = dst) AS nl, "
        "(SELECT MAX(d) FROM outd) AS dmax) "
        "SELECT CAST(n AS BIGINT) AS n_vertices, "
        "CAST(m_raw AS BIGINT) AS n_edges_raw, "
        "CAST(m AS BIGINT) AS n_edges, "
        "CAST(nl AS BIGINT) AS n_selfloops, "
        "CAST((1000000000 * m) // (n * (n - 1)) AS BIGINT) AS density_ppb, "
        "CAST(dmax AS BIGINT) AS max_out_deg, "
        "CAST((1000000 * m) // n AS BIGINT) AS mean_out_deg_ppm, "
        "CAST((1000000 * dmax) // m AS BIGINT) AS top_hub_share_ppm "
        "FROM stats"
    )


def neighbor_jaccard(
    edges: DataFrame,
    min_jaccard_ppm: int = 200_000,
    max_in_degree: int = 256,
    min_inter: int = 2,
) -> DataFrame:
    """Mirror/near-mirror candidates by exact Jaccard of OUT-neighbor
    sets: two hosts that link to largely the same targets are mirrors,
    boilerplate franchises, or template twins — the host-level analog
    of document shingle Jaccard (dedup.ngram_jaccard_pairs), with the
    same safe-by-default cap contract: targets whose in-degree exceeds
    ``max_in_degree`` are dropped BEFORE set sizes and the
    intersection join (a target linked by everyone carries no mirror
    signal, exactly like a stopword shingle), so the candidate join is
    bounded by cap² per target and the Jaccard is exact over the
    reduced target universe.

    Result: (src_a, src_b, inter, union_sz, jaccard_ppm) for pairs
    with inter ≥ min_inter and jaccard_ppm ≥ min_jaccard_ppm,
    jaccard_ppm = ⌊10⁶·|A∩B| / |A∪B|⌋."""
    e = edges.select("src", "dst").distinct()
    indeg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("d_in"))
    kept = e.join(
        indeg.where(F.col("d_in") <= max_in_degree), "dst", "left_semi"
    )
    sizes = kept.groupBy("src").agg(F.count(F.lit(1)).alias("sz"))
    a = kept.select(F.col("dst").alias("z"), F.col("src").alias("src_a"))
    b = kept.select(F.col("dst").alias("z"), F.col("src").alias("src_b"))
    inter = (
        a.join(b, "z")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
        .where(F.col("inter") >= min_inter)
    )
    sa = sizes.select(F.col("src").alias("src_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("src").alias("src_b"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "src_a")
        .join(sb, "src_b")
        .select(
            "src_a",
            "src_b",
            "inter",
            (F.col("sza") + F.col("szb") - F.col("inter"))
            .cast("long")
            .alias("union_sz"),
            F.expr("(1000000 * inter) div (sza + szb - inter)")
            .cast("long")
            .alias("jaccard_ppm"),
        )
        .where(F.col("jaccard_ppm") >= min_jaccard_ppm)
    )


def neighbor_jaccard_sql(
    edges_cte: str,
    min_jaccard_ppm: int = 200_000,
    max_in_degree: int = 256,
    min_inter: int = 2,
    edges_rel: str = "edges",
) -> str:
    """DuckDB twin of :func:`neighbor_jaccard`; ``edges_cte`` must
    provide an ``edges_rel``(src, dst) relation (the name is a
    parameter so callers whose CTE chains already bind `edges` can
    avoid the duplicate-CTE clash)."""
    return (
        f"WITH {edges_cte}, "
        f"e AS (SELECT DISTINCT src, dst FROM {edges_rel}), "
        "indeg AS (SELECT dst, COUNT(*) AS d_in FROM e GROUP BY dst), "
        "kept AS (SELECT e.src, e.dst FROM e JOIN indeg USING (dst) "
        f"WHERE indeg.d_in <= {max_in_degree}), "
        "sizes AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS sz "
        "FROM kept GROUP BY src), "
        "inter AS (SELECT a.src AS src_a, b.src AS src_b, "
        "CAST(COUNT(*) AS BIGINT) AS inter "
        "FROM kept a JOIN kept b ON a.dst = b.dst AND a.src < b.src "
        f"GROUP BY 1, 2 HAVING COUNT(*) >= {min_inter}) "
        "SELECT i.src_a, i.src_b, i.inter, "
        "CAST(sa.sz + sb.sz - i.inter AS BIGINT) AS union_sz, "
        "CAST(1000000 * i.inter // (sa.sz + sb.sz - i.inter) AS BIGINT) "
        "AS jaccard_ppm "
        "FROM inter i JOIN sizes sa ON sa.src = i.src_a "
        "JOIN sizes sb ON sb.src = i.src_b "
        f"WHERE 1000000 * i.inter // (sa.sz + sb.sz - i.inter) "
        f">= {min_jaccard_ppm}"
    )


def twin_classes(edges: DataFrame) -> DataFrame:
    """Structural-twin compression census: vertices with IDENTICAL
    out-neighbor sets ("false twins") are interchangeable for every
    neighborhood-determined computation — PageRank gives them equal
    scores, WL colors them identically — so a 100 TB engine can
    collapse each twin class to one supernode (with a multiplicity
    weight) before iterating and expand afterwards, often shaving
    10-30% off a template-heavy web graph where boilerplate pages
    share their link set. Class key = md5 of the sorted neighbor
    list, so the groupBy key is fixed-width regardless of degree.

    Result: histogram (class_size, n_classes, n_vertices) — the
    n_vertices − n_classes gap summed over class_size ≥ 2 is the
    vertex count compression the supernode pass would win."""
    sig = (
        edges.select("src", "dst")
        .distinct()
        .groupBy("src")
        .agg(
            F.md5(
                F.array_join(
                    F.sort_array(
                        F.collect_set(F.col("dst").cast("string"))
                    ),
                    ",",
                )
            ).alias("sig")
        )
    )
    classes = sig.groupBy("sig").agg(
        F.count(F.lit(1)).cast("long").alias("class_size")
    )
    return classes.groupBy("class_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("class_size").cast("long").alias("n_vertices"),
    )


def twin_classes_sql(edges_cte: str, edges_rel: str = "edges") -> str:
    """DuckDB twin of :func:`twin_classes`."""
    return (
        f"WITH {edges_cte}, "
        f"e AS (SELECT DISTINCT src, dst FROM {edges_rel}), "
        "sig AS (SELECT src, md5(array_to_string(list_sort("
        "list(CAST(dst AS VARCHAR))), ',')) AS sig FROM e GROUP BY src), "
        "classes AS (SELECT sig, CAST(COUNT(*) AS BIGINT) AS class_size "
        "FROM sig GROUP BY sig) "
        "SELECT class_size, CAST(COUNT(*) AS BIGINT) AS n_classes, "
        "CAST(SUM(class_size) AS BIGINT) AS n_vertices "
        "FROM classes GROUP BY class_size"
    )


def egonet_features(edges: DataFrame) -> DataFrame:
    """OddBall egonet census (Akoglu, McGlohon & Faloutsos, PAKDD 2010)
    — the per-vertex anomaly features that separate near-cliques (spam
    link farms, mutual-admiration rings) from near-stars (scrapers,
    doorway hubs) on a web link graph. For each vertex v on the
    undirected simple graph, the egonet is v plus its neighbors and
    every edge among them, so

        ego_nodes = deg(v) + 1
        ego_edges = deg(v) + T(v)        (spokes + neighbor-neighbor)

    where T(v) is the triangle count through v — :func:`vertex_triangles`
    reuses the degree-ordered orientation, so the enumeration is
    O(#triangles) even with hubs. Density is reported in exact integer
    ppm of the clique maximum (``2·E / (N·(N−1))``); ``is_clique`` /
    ``is_star`` are the exact structural extremes (OddBall flags the
    in-betweens by distance from the log-log power-law fit; the exact
    flags keep the operator integer-deterministic for the oracle gate).
    Pure relational plan — one symmetric degree agg, one triangle
    enumeration, one join; no Python. Result: (vid, ego_nodes,
    ego_edges, density_ppm, is_clique, is_star) with 0/1 int flags.
    """
    sym = _sym_edges(edges)
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    t = vertex_triangles(edges)
    tri = F.coalesce("n_triangles", F.lit(0)).cast("long")
    n = (F.col("deg") + F.lit(1)).cast("long")
    e = (F.col("deg") + tri).cast("long")
    return deg.join(t, "id", "left").select(
        F.col("id").alias("vid"),
        n.alias("ego_nodes"),
        e.alias("ego_edges"),
        F.floor(F.lit(2_000_000) * e / (n * (n - F.lit(1))))
        .cast("long")
        .alias("density_ppm"),
        F.when(F.lit(2) * e == n * (n - F.lit(1)), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_clique"),
        F.when((tri == 0) & (F.col("deg") >= 2), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_star"),
    )


def egonet_features_sql(edges_cte: str) -> str:
    """DuckDB twin of :func:`egonet_features` — same one-row-per-corner
    triangle CTE as the clustering_coefficient oracle, BIGINT-pinned."""
    return (
        f"WITH {edges_cte}, "
        "sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges), "
        "deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg"
        " FROM sym GROUP BY src), "
        "tri AS (SELECT e1.src AS v, CAST(COUNT(*) AS BIGINT) AS t "
        "FROM sym e1 JOIN sym e2 ON e2.src = e1.src AND e1.dst < e2.dst "
        "JOIN sym e3 ON e3.src = e1.dst AND e3.dst = e2.dst GROUP BY e1.src), "
        "ego AS (SELECT d.id AS vid, d.deg + 1 AS n,"
        " d.deg + COALESCE(t.t, 0) AS e, COALESCE(t.t, 0) AS t, d.deg AS deg "
        "FROM deg d LEFT JOIN tri t ON t.v = d.id) "
        "SELECT vid, CAST(n AS BIGINT) AS ego_nodes,"
        " CAST(e AS BIGINT) AS ego_edges, "
        "CAST(FLOOR(2000000 * e / (n * (n - 1))) AS BIGINT) AS density_ppm, "
        "CAST(CASE WHEN 2 * e = n * (n - 1) THEN 1 ELSE 0 END AS BIGINT)"
        " AS is_clique, "
        "CAST(CASE WHEN t = 0 AND deg >= 2 THEN 1 ELSE 0 END AS BIGINT)"
        " AS is_star "
        "FROM ego"
    )


def scan_core_edges(
    edges: DataFrame,
    eps2_num: int = 49,
    eps2_den: int = 100,
    mu: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """SCAN structural similarity (Xu, Yuruk, Feng & Schweiger, KDD
    2007) — the σ-threshold machinery under :func:`scan_clusters`.
    For each undirected edge, σ(u,v) = |Γ(u)∩Γ(v)| / √(|Γ(u)|·|Γ(v)|)
    over CLOSED neighborhoods; (u,v) is ε-similar iff σ ≥ ε, and a
    vertex is a CORE iff its closed ε-neighborhood has ≥ μ members.
    The ε-test is evaluated in exact integers by squaring — with
    ε² = eps2_num/eps2_den, σ ≥ ε ⟺ eps2_den·(cn+2)² ≥
    eps2_num·(deg_u+1)·(deg_v+1) (cn = shared OPEN neighbors, the
    edge's triangle support; +2/+1 close the neighborhoods) — so the
    filter is deterministic and oracle-exact, no float sqrt.

    Support comes from :func:`~drone_spark.algorithms.trusses.
    edge_support` (degree-ordered triangle enumeration — O(#triangles),
    hub-safe, support-0 edges kept: low-degree pairs can pass ε with
    zero shared neighbors). Returns (eps_edges, cores): the ε-similar
    canonical edge set (u < v) and the core vertex ids.
    """
    from .trusses import edge_support

    sup = edge_support(edges)
    sym = _sym_edges(edges)
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    cn = F.col("support") + F.lit(2)
    ok = (
        sup.join(deg.select(F.col("id").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("deg").alias("dv")), "v")
        .where(
            F.lit(eps2_den) * cn * cn
            >= F.lit(eps2_num) * (F.col("du") + 1) * (F.col("dv") + 1)
        )
        .select("u", "v")
    )
    epsdeg = (
        ok.select(F.col("u").alias("id"))
        .unionAll(ok.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("nd"))
    )
    cores = epsdeg.where(F.col("nd") + 1 >= mu).select("id")
    return ok, cores


def scan_clusters(
    spark,
    engine,
    edges: DataFrame,
    eps2_num: int = 49,
    eps2_den: int = 100,
    mu: int = 3,
    run_id: str = "scan",
    max_supersteps: int = 100,
) -> DataFrame:
    """SCAN clustering (Xu et al., KDD 2007), core clusters: connected
    components over the ε-similar edges BETWEEN core vertices, labeled
    by component-min vid; ε-isolated cores are singleton clusters.
    (SCAN further attaches borders and names hubs/outliers — the core
    partition is the stable part and keeps the operator deterministic;
    borders follow by one more join on the ε-edge set.)

    The closure reuses the iterative CC kernel (algorithms/cc.py) —
    frontier-routed min-label passing, NOT a driver-side union-find —
    so the clustering step scales like any other graph job; the
    σ-filter before it already shrank the edge set. Result: (vid,
    cluster) over core vertices only.
    """
    from .cc import connected_components

    ok, cores = scan_core_edges(edges, eps2_num, eps2_den, mu)
    core_edges = (
        ok.join(cores.withColumnRenamed("id", "u"), "u")
        .join(cores.withColumnRenamed("id", "v"), "v")
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )
    res = connected_components(
        spark, engine, core_edges, run_id=run_id,
        backend="relational", max_supersteps=max_supersteps,
    )
    comp = res.state.select(
        F.col("vid").alias("id"), F.col("label").alias("cluster")
    )
    return cores.join(comp, "id", "left").select(
        F.col("id").alias("vid"),
        F.coalesce("cluster", F.col("id")).cast("long").alias("cluster"),
    )


def scan_clusters_sql(
    edges_cte: str,
    eps2_num: int = 49,
    eps2_den: int = 100,
    mu: int = 3,
) -> str:
    """DuckDB twin of :func:`scan_clusters` — support via the canonical
    3-way join (support-0 edges kept by the left join), the same exact
    squared-ε filter, recursive min-label walk over core-core edges."""
    return (
        f"WITH RECURSIVE {edges_cte}, "
        "und AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v "
        "FROM edges WHERE src <> dst), "
        "usym AS (SELECT u AS s, v AS d FROM und UNION ALL SELECT v, u FROM und), "
        "deg AS (SELECT s AS id, CAST(COUNT(*) AS BIGINT) AS deg "
        "FROM usym GROUP BY s), "
        "tri AS (SELECT e.u, e.v, CAST(COUNT(*) AS BIGINT) AS support "
        "FROM und e JOIN usym a ON a.s = e.u JOIN usym b ON b.s = e.v "
        "AND b.d = a.d GROUP BY e.u, e.v), "
        "sup AS (SELECT und.u, und.v, COALESCE(tri.support, 0) AS support "
        "FROM und LEFT JOIN tri ON tri.u = und.u AND tri.v = und.v), "
        "ok AS (SELECT s.u, s.v FROM sup s "
        "JOIN deg a ON a.id = s.u JOIN deg b ON b.id = s.v "
        f"WHERE {eps2_den} * (s.support + 2) * (s.support + 2) >= "
        f"{eps2_num} * (a.deg + 1) * (b.deg + 1)), "
        "epsdeg AS (SELECT id, COUNT(*) AS nd FROM "
        "(SELECT u AS id FROM ok UNION ALL SELECT v FROM ok) GROUP BY id), "
        f"cores AS (SELECT id FROM epsdeg WHERE nd + 1 >= {mu}), "
        "ce AS (SELECT ok.u, ok.v FROM ok "
        "JOIN cores cu ON cu.id = ok.u JOIN cores cv ON cv.id = ok.v), "
        "cesym AS (SELECT u AS s, v AS d FROM ce UNION ALL SELECT v, u FROM ce), "
        "walk(id, lab) AS ("
        " SELECT id, id FROM cores"
        " UNION"
        " SELECT s.d, w.lab FROM walk w JOIN cesym s ON s.s = w.id"
        " WHERE w.lab < s.d) "
        "SELECT id AS vid, CAST(MIN(lab) AS BIGINT) AS cluster "
        "FROM walk GROUP BY id"
    )


def collective_influence(
    edges: DataFrame,
    k: int = 50,
    max_degree: int = 256,
) -> DataFrame:
    """Collective Influence at radius 2 (Morone & Makse, Nature 2015)
    — the optimal-percolation heuristic for finding the influencers
    whose removal most fragments a network:

        CI₂(v) = (deg v − 1) · Σ_{u : d(v,u)=2} (deg u − 1)

    The ball boundary {u : d(v,u)=2} is exact: neighbors-of-neighbors,
    minus v itself, minus v's direct neighbors, de-duplicated. Plan:
    two self-joins of the symmetric edge table + one anti-join — all
    hash joins, exact integer output.

    Safe-by-default hub cap (the adamic_adar / dedup max_doc_freq
    contract): a middle vertex m fans its deg(m)² two-hop pairs into
    the join, so paths THROUGH vertices with deg > ``max_degree`` are
    skipped — O(cap²) rows per middle vertex, never a hub blow-up; at
    web scale the skipped hubs are exactly the ones whose boundary
    contribution the frontier-ball variant (engine superstep) would
    compute instead. The cap is part of the operator contract and the
    oracle applies the same filter. Result: top-k (vid, deg, ci) by
    ci desc, vid asc."""
    sym = _sym_edges(edges)
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    mid_ok = deg.where(F.col("deg") <= max_degree).select(
        F.col("id").alias("m")
    )
    hop1 = sym.select(F.col("src").alias("v"), F.col("dst").alias("m"))
    hop2 = (
        hop1.join(mid_ok, "m")
        .join(
            sym.select(F.col("src").alias("m"), F.col("dst").alias("u")), "m"
        )
        .where(F.col("u") != F.col("v"))
        .select("v", "u")
        .distinct()
        .join(
            sym.select(F.col("src").alias("v"), F.col("dst").alias("u")),
            ["v", "u"],
            "left_anti",
        )
    )
    boundary = (
        hop2.join(deg.select(F.col("id").alias("u"), F.col("deg").alias("du")), "u")
        .groupBy("v")
        .agg(F.sum(F.col("du") - 1).alias("bsum"))
    )
    return (
        deg.select(F.col("id").alias("v"), "deg")
        .join(boundary, "v", "left")
        .select(
            F.col("v").alias("vid"),
            F.col("deg").cast("long").alias("deg"),
            ((F.col("deg") - 1) * F.coalesce("bsum", F.lit(0)))
            .cast("long")
            .alias("ci"),
        )
        .orderBy(F.desc("ci"), F.asc("vid"))
        .limit(k)
    )


def collective_influence_sql(
    edges_cte: str, k: int = 50, max_degree: int = 256
) -> str:
    """DuckDB twin of :func:`collective_influence`."""
    return (
        f"WITH {edges_cte}, "
        "sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges), "
        "deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg "
        "FROM sym GROUP BY src), "
        f"midok AS (SELECT id AS m FROM deg WHERE deg <= {max_degree}), "
        "hop2 AS (SELECT DISTINCT h1.src AS v, h2.dst AS u "
        "FROM sym h1 JOIN midok ON midok.m = h1.dst "
        "JOIN sym h2 ON h2.src = h1.dst WHERE h2.dst <> h1.src), "
        "ball AS (SELECT h.v, h.u FROM hop2 h "
        "LEFT JOIN sym e ON e.src = h.v AND e.dst = h.u WHERE e.src IS NULL), "
        "boundary AS (SELECT b.v, SUM(d.deg - 1) AS bsum FROM ball b "
        "JOIN deg d ON d.id = b.u GROUP BY b.v) "
        "SELECT d.id AS vid, d.deg, "
        "CAST((d.deg - 1) * COALESCE(b.bsum, 0) AS BIGINT) AS ci "
        "FROM deg d LEFT JOIN boundary b ON b.v = d.id "
        f"ORDER BY ci DESC, vid ASC LIMIT {k}"
    )


def walk_entropy_rate(edges: DataFrame) -> DataFrame:
    """Entropy rate of the simple random walk on the undirected graph
    (Burda, Duda, Luck & Waclaw, PRL 2009): with stationary
    distribution π_v = deg v / 2E, h = Σ_v π_v ln(deg v) — the bits
    per step the walk generates, the quantity maximal-entropy crawl
    schedulers compare against. Computed per DEGREE CLASS:
    h = Σ_d n_d · d · ln d / 2E over the ~dozens of distinct degree
    values, so the float sum runs over a tiny exact-integer histogram
    (deterministic across engines) instead of |V| rows. Result: one
    row (n_vertices, n_edges, entropy_rate round-6)."""
    sym = _sym_edges(edges)
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    hist = deg.groupBy("deg").agg(F.count(F.lit(1)).alias("n"))
    return hist.agg(
        F.sum("n").cast("long").alias("n_vertices"),
        (F.sum(F.col("n") * F.col("deg")) / 2).cast("long").alias("n_edges"),
        F.round(
            F.sum(F.col("n") * F.col("deg") * F.log(F.col("deg")))
            / F.sum(F.col("n") * F.col("deg")),
            6,
        ).alias("entropy_rate"),
    )


def walk_entropy_rate_sql(edges_cte: str) -> str:
    """DuckDB twin of :func:`walk_entropy_rate`."""
    return (
        f"WITH {edges_cte}, "
        "sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges), "
        "deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg "
        "FROM sym GROUP BY src), "
        "hist AS (SELECT deg, CAST(COUNT(*) AS BIGINT) AS n FROM deg "
        "GROUP BY deg) "
        "SELECT CAST(SUM(n) AS BIGINT) AS n_vertices, "
        "CAST(SUM(n * deg) / 2 AS BIGINT) AS n_edges, "
        "ROUND(SUM(n * deg * LN(deg)) / SUM(n * deg), 6) AS entropy_rate "
        "FROM hist"
    )


def square_count(edges: DataFrame, max_degree: int = 256) -> DataFrame:
    """Global 4-cycle (square) count — the graphlet the triangle/
    4-clique/butterfly census was missing; C4 density drives the
    spectral gap and spam-farm detection (link exchanges are
    square-rich, triangle-poor). Identity: every C4 is counted once
    per diagonal pair, so

        #C4 = ⌊ Σ_{unordered pairs (x,y)} C(cn(x,y), 2) / 2 ⌋

    with cn = common-neighbor count, derived from 2-paths x−m−y.
    Middle vertices with deg > ``max_degree`` are skipped (a middle
    fans C(deg,2) pair rows — the adamic_adar safe-by-default hub
    contract; the oracle applies the same cap, and under a cap the
    floor makes the halving well-defined when only one diagonal of a
    square survives). Exact integers throughout. Result: one row
    (diagonal_incidences, n_squares)."""
    sym = _sym_edges(edges)
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    mid_ok = deg.where(F.col("deg") <= max_degree).select(F.col("id").alias("m"))
    pairs = (
        sym.select(F.col("src").alias("m"), F.col("dst").alias("x"))
        .join(mid_ok, "m")
        .join(sym.select(F.col("src").alias("m"), F.col("dst").alias("y")), "m")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    return pairs.agg(
        F.sum(F.col("cn") * (F.col("cn") - 1) / 2)
        .cast("long")
        .alias("diagonal_incidences"),
        F.floor(F.sum(F.col("cn") * (F.col("cn") - 1) / 2) / 2)
        .cast("long")
        .alias("n_squares"),
    )


def square_count_sql(edges_cte: str, max_degree: int = 256) -> str:
    """DuckDB twin of :func:`square_count`."""
    return (
        f"WITH {edges_cte}, "
        "sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges), "
        "deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg "
        "FROM sym GROUP BY src), "
        f"midok AS (SELECT id AS m FROM deg WHERE deg <= {max_degree}), "
        "pairs AS (SELECT a.dst AS x, b.dst AS y, "
        "CAST(COUNT(*) AS BIGINT) AS cn "
        "FROM sym a JOIN midok ON midok.m = a.src "
        "JOIN sym b ON b.src = a.src AND a.dst < b.dst "
        "GROUP BY a.dst, b.dst) "
        "SELECT CAST(SUM(cn * (cn - 1) / 2) AS BIGINT)"
        " AS diagonal_incidences, "
        "CAST(FLOOR(SUM(cn * (cn - 1) / 2) / 2) AS BIGINT) AS n_squares "
        "FROM pairs"
    )
