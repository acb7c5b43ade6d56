"""Distributed probabilistic sketches: HyperLogLog, Count–Min, Bloom.

The three sketch primitives a 100 TB corpus/link-graph engine leans on
when exact answers are unaffordable:

- **HyperLogLog** — distinct-count without a ``COUNT(DISTINCT)``
  shuffle of the raw values: each partition folds its rows into m=64
  integer registers (map-side partial agg), so the shuffle moves at
  most ``groups × 64`` rows regardless of input size. At 10^12 pages
  this is the only way to answer "how many unique outlink targets per
  host" in one pass.
- **Count–Min** — heavy-hitter frequency estimates from a fixed
  d×w grid of counters. The sketch build is a single
  ``groupBy(row, cell).count()`` over the edge stream (partial agg
  again bounds shuffle at d·w rows per partition); no per-key state
  ever materializes, so power-law in-degree skew cannot blow memory.
- **Bloom** — a broadcastable bit-set membership prefilter: build once
  over the small "hub" side, broadcast ~m/8 bytes, and drop non-member
  rows *before* the expensive semi-join shuffle. The query reports the
  false-positive rows explicitly so the cost model is measurable.

Determinism contract (same trick as ops/dedup.py): every hash is the
60-bit md5 idiom ``('0x' || substr(md5(salt || x), 1, 15))::BIGINT``,
identical in Spark, DuckDB and Python, and every register/cell index is
carved out with power-of-2 bit ops (``& mask`` / ``>> p``) so the
60-bit hash never round-trips through a double. All outputs are
integers (estimates go through FLOOR before the BIGINT cast — Spark's
double→long cast truncates while DuckDB's rounds), so the DuckDB twins
in ``__spark_entry__.py`` hash-match bit-for-bit.

The reference engine has no sketch tier at all (SURVEY §2.4: "approx
aggs — absent"); this module is part of the beyond-reference surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------------------
# shared 60-bit md5 hash (Spark side) — twin of the SQL fragment below
# ---------------------------------------------------------------------------


def _h60(col, salt: str):
    """60-bit deterministic hash of a value rendered as a string."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 15), 16, 10
    ).cast("long")


def _h60_sql(expr: str, salt: str) -> str:
    return f"('0x' || substr(md5('{salt}' || CAST({expr} AS VARCHAR)), 1, 15))::BIGINT"


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

HLL_P = 6  # m = 64 registers per group
HLL_M = 1 << HLL_P
HLL_W = 60 - HLL_P  # width of the rank field (54 bits)
_POW2_W = float(1 << (HLL_W + 1))  # 2^55 — the integer scale for Z
_ALPHA_M = 0.709  # standard HLL alpha for m = 64


def hll_distinct(
    df: DataFrame, group_col: str, value_col: str, salt: str = "hll:"
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate next to the exact count.

    Register index = low ``p`` bits of the 60-bit hash; rank = leading-
    zero count of the remaining 54-bit word + 1 (via ``length(bin(w))``
    — both Spark and DuckDB print minimal binary, so
    ``rank = 55 - bitlen`` with the all-zero word pinned to 55). The
    harmonic mean is summed as the *integer* ``2^(55 - M_j)`` so Z is
    exact; the only floating-point steps are one division and (on the
    small-range branch) one ln — identical single IEEE ops on both
    engines. Small-range (linear counting) correction applies when
    ``E <= 2.5m`` and empty registers remain, per the HLL paper.

    Scale shape: the register table is ``groups × 64`` rows produced by
    a partial-aggregating groupBy — the raw values never shuffle. The
    exact count alongside is for audit at test SF only; at 100 TB you
    run the sketch alone.
    """
    h = _h60(value_col, salt)
    regs = (
        df.select(
            F.col(group_col).alias("grp"),
            h.bitwiseAND(HLL_M - 1).alias("j"),
            F.shiftright(h, HLL_P).alias("w"),
        )
        .select(
            "grp",
            "j",
            F.when(F.col("w") == 0, F.lit(HLL_W + 1))
            .otherwise(F.lit(HLL_W + 1) - F.length(F.bin("w")))
            .alias("rank"),
        )
        .groupBy("grp", "j")
        .agg(F.max("rank").alias("m_j"))
    )
    grid = (
        df.select(F.col(group_col).alias("grp"))
        .distinct()
        .crossJoin(df.sparkSession.range(HLL_M).select(F.col("id").alias("j")))
    )
    full = grid.join(regs, ["grp", "j"], "left").select(
        "grp", "j", F.coalesce("m_j", F.lit(0)).alias("m_j")
    )
    agg = full.groupBy("grp").agg(
        F.sum(
            F.pow(F.lit(2.0), F.lit(HLL_W + 1) - F.col("m_j")).cast("long")
        ).alias("z_scaled"),
        F.sum(F.when(F.col("m_j") == 0, 1).otherwise(0)).alias("v_empty"),
    )
    e_raw = (
        F.lit(_ALPHA_M) * F.lit(float(HLL_M)) * F.lit(float(HLL_M)) * F.lit(_POW2_W)
        / F.col("z_scaled")
    )
    e = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (F.col("v_empty") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("v_empty")),
    ).otherwise(e_raw)
    est = agg.select("grp", F.floor(e).cast("long").alias("est_distinct"))
    exact = (
        df.select(F.col(group_col).alias("grp"), F.col(value_col).alias("v"))
        .groupBy("grp")
        .agg(F.countDistinct("v").alias("exact_distinct"))
    )
    return est.join(exact, "grp").select(
        F.col("grp").alias(group_col), "est_distinct", "exact_distinct"
    )


def hll_distinct_sql(
    source_cte: str, group_expr: str, value_expr: str, salt: str = "hll:"
) -> str:
    """DuckDB twin of :func:`hll_distinct` over ``src`` CTE rows."""
    h = _h60_sql(value_expr, salt)
    w1 = HLL_W + 1
    return (
        f"WITH {source_cte}, "
        f"hashed AS (SELECT {group_expr} AS grp, {h} AS h FROM src), "
        f"ranked AS (SELECT grp, h & {HLL_M - 1} AS j, "
        f"CASE WHEN (h >> {HLL_P}) = 0 THEN {w1} "
        f"ELSE {w1} - length(bin(h >> {HLL_P})) END AS rank FROM hashed), "
        "regs AS (SELECT grp, j, MAX(rank) AS m_j FROM ranked GROUP BY grp, j), "
        f"grid AS (SELECT g.grp, r.range AS j FROM (SELECT DISTINCT grp FROM hashed) g "
        f"CROSS JOIN range({HLL_M}) r), "
        "filled AS (SELECT grid.grp, grid.j, COALESCE(regs.m_j, 0) AS m_j "
        "FROM grid LEFT JOIN regs ON grid.grp = regs.grp AND grid.j = regs.j), "
        f"agg AS (SELECT grp, SUM(CAST(POWER(2.0, {w1} - m_j) AS BIGINT)) AS z_scaled, "
        "SUM(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS v_empty FROM filled GROUP BY grp), "
        f"est AS (SELECT grp, CAST(FLOOR(CASE WHEN "
        f"{_ALPHA_M} * {float(HLL_M)} * {float(HLL_M)} * {_POW2_W} / z_scaled <= {2.5 * HLL_M} "
        f"AND v_empty > 0 THEN {float(HLL_M)} * LN({float(HLL_M)} / v_empty) "
        f"ELSE {_ALPHA_M} * {float(HLL_M)} * {float(HLL_M)} * {_POW2_W} / z_scaled END) "
        "AS BIGINT) AS est_distinct FROM agg), "
        f"exact AS (SELECT {group_expr} AS grp, COUNT(DISTINCT {value_expr}) "
        "AS exact_distinct FROM src GROUP BY 1) "
        "SELECT est.grp, est.est_distinct, exact.exact_distinct "
        "FROM est JOIN exact ON est.grp = exact.grp"
    )


# ---------------------------------------------------------------------------
# Count–Min
# ---------------------------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 1 << 10  # 1024 cells per row


def cms_heavy_hitters(
    df: DataFrame, value_col: str, k: int = 30, salt: str = "cms"
) -> DataFrame:
    """Count–Min frequency estimates for the top-k exact heavy hitters.

    Builds the d×w counter grid in one union-of-projections pass
    (Catalyst partial-aggregates each, so the shuffle is ≤ d·w rows per
    partition), then probes it for the k most frequent values. The
    estimate is the classic ``min_i grid[i][h_i(x)]`` — an
    overestimate-only bound; at test SF the output shows exactly which
    hitters collide. ``exact_cnt`` comes from a separate top-k
    aggregate (TakeOrderedAndProject — per-partition heap, no global
    sort) and is the audit column.
    """
    vals = df.select(F.col(value_col).alias("v"))
    cells = None
    for i in range(CMS_D):
        part = vals.select(
            F.lit(i).alias("r"),
            _h60("v", f"{salt}{i}:").bitwiseAND(CMS_W - 1).alias("c"),
        )
        cells = part if cells is None else cells.unionAll(part)
    grid = cells.groupBy("r", "c").agg(F.count(F.lit(1)).alias("cnt"))
    top = (
        vals.groupBy("v")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("v"))
        .limit(k)
    )
    probes = top.select(
        "v",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        _h60("v", f"{salt}{i}:").bitwiseAND(CMS_W - 1).alias("c"),
                    )
                    for i in range(CMS_D)
                ]
            )
        ).alias("p"),
    ).select("v", "exact_cnt", F.col("p.r").alias("r"), F.col("p.c").alias("c"))
    return (
        probes.join(grid, ["r", "c"])
        .groupBy("v", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
        .select(F.col("v").alias(value_col), "exact_cnt", "cms_est")
    )


def cms_heavy_hitters_sql(
    source_cte: str, value_expr: str, k: int = 30, salt: str = "cms"
) -> str:
    """DuckDB twin of :func:`cms_heavy_hitters` over ``src`` CTE rows."""
    hashes = [
        f"SELECT {i} AS r, {_h60_sql('v', f'{salt}{i}:')} & {CMS_W - 1} AS c FROM vals"
        for i in range(CMS_D)
    ]
    probe_rows = " UNION ALL ".join(
        f"SELECT v, exact_cnt, {i} AS r, "
        f"{_h60_sql('v', f'{salt}{i}:')} & {CMS_W - 1} AS c FROM top"
        for i in range(CMS_D)
    )
    return (
        f"WITH {source_cte}, "
        f"vals AS (SELECT {value_expr} AS v FROM src), "
        f"cells AS ({' UNION ALL '.join(hashes)}), "
        "grid AS (SELECT r, c, COUNT(*) AS cnt FROM cells GROUP BY r, c), "
        "top AS (SELECT v, COUNT(*) AS exact_cnt FROM vals GROUP BY v "
        f"ORDER BY exact_cnt DESC, v ASC LIMIT {k}), "
        f"probes AS ({probe_rows}) "
        "SELECT probes.v, probes.exact_cnt, MIN(grid.cnt) AS cms_est "
        "FROM probes JOIN grid ON probes.r = grid.r AND probes.c = grid.c "
        "GROUP BY probes.v, probes.exact_cnt"
    )


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

BLOOM_M = 1 << 12  # 4096 bits
BLOOM_K = 3


def bloom_prefilter(
    members: DataFrame,
    candidates: DataFrame,
    value_col: str,
    salt: str = "bf",
) -> DataFrame:
    """Bloom-filter membership test of ``candidates`` against ``members``.

    Returns one row per candidate with ``bloom_hit`` (all k bits set)
    and ``exact_hit`` (true semi-join answer) — the false-positive rows
    are exactly ``bloom_hit = 1 AND exact_hit = 0``.

    At scale the bit-set is the broadcast side: 4096 bits ≈ distinct
    ``(bit)`` rows ≤ 4096 regardless of member count, so the candidate
    scan joins against a broadcast hash table and non-members never
    reach the real join's shuffle. The k probes are unpivoted to
    (candidate, bit) rows and counted — a pure equi-join plan with no
    Python and no per-row loops.
    """
    mv = members.select(F.col(value_col).alias("v")).distinct()
    bits = None
    for i in range(BLOOM_K):
        b = mv.select(
            _h60("v", f"{salt}{i}:").bitwiseAND(BLOOM_M - 1).alias("bit")
        )
        bits = b if bits is None else bits.unionAll(b)
    bits = bits.distinct()
    cv = candidates.select(F.col(value_col).alias("v")).distinct()
    probes = cv.select(
        "v",
        F.explode(
            F.array(
                *[
                    _h60("v", f"{salt}{i}:").bitwiseAND(BLOOM_M - 1)
                    for i in range(BLOOM_K)
                ]
            )
        ).alias("bit"),
    )
    hit_counts = (
        probes.join(F.broadcast(bits), "bit", "left_semi")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("nbits"))
    )
    exact = mv.select("v", F.lit(1).alias("exact_hit"))
    return (
        cv.join(hit_counts, "v", "left")
        .join(exact, "v", "left")
        .select(
            F.col("v").alias(value_col),
            F.when(F.coalesce("nbits", F.lit(0)) == BLOOM_K, 1)
            .otherwise(0)
            .alias("bloom_hit"),
            F.coalesce("exact_hit", F.lit(0)).alias("exact_hit"),
        )
    )


def bloom_prefilter_sql(
    ctes: str, members_cte: str, candidates_cte: str, salt: str = "bf"
) -> str:
    """DuckDB twin of :func:`bloom_prefilter`. ``members_cte`` /
    ``candidates_cte`` must each expose a single column ``v``."""
    bit_rows = " UNION ALL ".join(
        f"SELECT {_h60_sql('v', f'{salt}{i}:')} & {BLOOM_M - 1} AS bit "
        f"FROM {members_cte}"
        for i in range(BLOOM_K)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT v, {_h60_sql('v', f'{salt}{i}:')} & {BLOOM_M - 1} AS bit "
        f"FROM {candidates_cte}"
        for i in range(BLOOM_K)
    )
    return (
        f"WITH {ctes}, "
        f"bits AS (SELECT DISTINCT bit FROM ({bit_rows})), "
        f"probes AS ({probe_rows}), "
        "hits AS (SELECT v, COUNT(*) AS nbits FROM probes "
        "WHERE bit IN (SELECT bit FROM bits) GROUP BY v) "
        f"SELECT c.v, CASE WHEN COALESCE(h.nbits, 0) = {BLOOM_K} THEN 1 ELSE 0 END "
        "AS bloom_hit, CASE WHEN m.v IS NOT NULL THEN 1 ELSE 0 END AS exact_hit "
        f"FROM {candidates_cte} c LEFT JOIN hits h ON c.v = h.v "
        f"LEFT JOIN (SELECT DISTINCT v FROM {members_cte}) m ON c.v = m.v"
    )


# ---------------------------------------------------------------------------
# two-pass exact heavy hitters (Misra–Gries candidate generation)
# ---------------------------------------------------------------------------


def heavy_hitters(
    values: DataFrame,
    k: int = 200,
    value_col: str = "v",
) -> DataFrame:
    """EXACT heavy hitters — every value with frequency strictly above
    N/k — found without ever shuffling the full value stream, via the
    two-pass Misra–Gries/SpaceSaving recipe:

    Pass 1 (candidates): each partition summarizes its rows locally
    (``mapInPandas`` — one C-speed ``value_counts`` per partition, no
    per-row Python) and emits only the values whose LOCAL frequency
    exceeds n_p/k. Pigeonhole guarantee: if a value's GLOBAL frequency
    exceeds N/k it must exceed n_p/k in at least one partition, so the
    union of partition candidates is a superset of the true heavy
    hitters. At most k-1 candidates leave each partition — the shuffle
    is bounded by k·partitions rows regardless of N or skew.

    Pass 2 (exact recount): a broadcast semi-join keeps only candidate
    rows, then one bounded groupBy recounts them exactly and the
    N·freq > N/k filter drops pass-1 false positives. The output is
    therefore EXACTLY the set an exact full groupBy would give —
    partition-layout-independent — with exact counts, which is why the
    DuckDB oracle is a plain GROUP BY ... HAVING. Complements the
    Count–Min sketch above (estimates for ALL keys) with the exact
    top-tier set.

    Result: (v, cnt) — values with cnt · k > N.
    """
    import pandas as pd

    total = values.count()

    def cand(batches):
        counts: dict = {}
        n_p = 0
        for pdf in batches:
            n_p += len(pdf)
            vc = pdf[value_col].value_counts()
            for val, c in vc.items():
                counts[val] = counts.get(val, 0) + int(c)
        out = [v for v, c in counts.items() if c * k > n_p]
        yield pd.DataFrame({value_col: pd.Series(out, dtype="object")})

    cands = (
        values.select(value_col)
        .mapInPandas(cand, schema=f"{value_col} string")
        .distinct()
    )
    exact = (
        values.join(F.broadcast(cands), value_col, "left_semi")
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * k > F.lit(total))
        .select(F.col(value_col).alias("v"), F.col("cnt").cast("long"))
    )
    return exact


def heavy_hitters_sql(values_cte: str, k: int = 200) -> str:
    """DuckDB twin of :func:`heavy_hitters` — the two-pass recipe is
    provably equal to the exact filter, so the oracle IS the exact
    filter (values: CTE named ``vals`` with column ``v``)."""
    return (
        f"WITH {values_cte}, "
        "tot AS (SELECT COUNT(*) AS n FROM vals) "
        "SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM vals, tot "
        f"GROUP BY v, tot.n HAVING COUNT(*) * {k} > tot.n"
    )
