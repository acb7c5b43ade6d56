"""Approximate neighborhood function — distributed FM/HyperANF sketches.

The exact distance distribution (algorithms/centrality.py) BFS-floods
from sampled landmarks; at 10¹²-vertex web scale the standard answer is
ANF/HyperANF (Palmer et al. KDD'02; Boldi–Rosa–Vigna WWW'11): every
vertex carries a fixed-size Flajolet–Martin sketch of its reachable
set, and one superstep ORs each vertex's sketch with its out-neighbors'
— after h rounds the sketch estimates |{u : dist(v→u) ≤ h}|. Constant
state per vertex, one bitwise-OR shuffle per round, no landmarks, every
vertex measured.

Determinism contract: the FM bit for (register, vertex) derives from
md5 (the engine-wide portable idiom), so sketches are bit-identical on
any layout AND reproducible in DuckDB — the unrolled-round SQL twin in
``__spark_entry__`` hash-matches the raw sketch registers exactly.

Plan shape per round: edges ⋈ state on dst (the message), map-side
partial ``bit_or`` groupBy src, left-join back onto state — the same
one-exchange-per-superstep scatter/combine as PageRank, with a 32-byte
payload per vertex regardless of graph size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# geometric bit position = leading-zero count of a uniform 60-bit hash:
# p = 59 - floor(log2 h) (60 for h = 0), P(p = k) = 2^-(k+1). Built as
# an exact integer CASE ladder so Spark and DuckDB agree bit-for-bit
# (no float log2 anywhere).
_HASH_BITS = 60


def _fm_bit(h: Column) -> Column:
    """1 << (leading-zero count of the 60-bit hash) as a long."""
    expr = F.lit(1 << _HASH_BITS).cast("long")  # h == 0 case
    for p in range(_HASH_BITS - 1, -1, -1):
        expr = F.when(
            h >= F.lit(1 << (_HASH_BITS - 1 - p)), F.lit(1 << p).cast("long")
        ).otherwise(expr)
    return expr


def fm_bit_sql(hexpr: str) -> str:
    """DuckDB twin of :func:`_fm_bit`."""
    whens = " ".join(
        f"WHEN {hexpr} >= {1 << (_HASH_BITS - 1 - p)} THEN (1::BIGINT << {p})"
        for p in range(0, _HASH_BITS)
    )
    return f"(CASE {whens} ELSE (1::BIGINT << {_HASH_BITS}) END)"


def _reg_hash(vid: Column, r: int) -> Column:
    """Uniform 60-bit hash of (register, vertex)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"anf{r}:"), vid.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def reg_hash_sql(vid_expr: str, r: int) -> str:
    return (
        f"CAST(('0x' || substr(md5('anf{r}:' || CAST({vid_expr} AS VARCHAR)),"
        " 1, 15)) AS BIGINT)"
    )


def anf_sketches(
    edges: DataFrame, rounds: int = 3, registers: int = 4
) -> DataFrame:
    """FM sketches of the h-hop OUT-neighborhood for every vertex and
    every h ≤ ``rounds`` collapsed to the final round: returns
    (vid, s0..s{registers-1}) raw 64-bit register masks after
    ``rounds`` OR-propagation supersteps. Feed to
    :func:`anf_estimate` for the cardinality estimate, or diff two
    rounds' outputs for the per-hop growth curve."""
    if rounds < 0:
        raise ValueError("rounds >= 0")
    e = edges.select("src", "dst").distinct()
    v = (
        e.select(F.col("src").alias("vid"))
        .unionAll(e.select(F.col("dst").alias("vid")))
        .distinct()
    )
    regs = [f"s{r}" for r in range(registers)]
    state = v.select(
        "vid",
        *[_fm_bit(_reg_hash(F.col("vid"), r)).alias(f"s{r}") for r in range(registers)],
    )
    for i in range(rounds):
        if i and i % 4 == 0:
            # flat lineage: 4 unrolled join rounds per materialization
            # (same localCheckpoint cadence as the superstep engine)
            state = state.localCheckpoint(eager=True)
        msgs = e.join(
            state.select(F.col("vid").alias("dst"), *regs), "dst"
        ).select(F.col("src").alias("vid"), *regs)
        agg = msgs.groupBy("vid").agg(
            *[F.bit_or(r).alias(f"m_{r}") for r in regs]
        )
        state = state.join(agg, "vid", "left").select(
            "vid",
            *[
                (
                    F.col(r).bitwiseOR(F.coalesce(F.col(f"m_{r}"), F.lit(0)))
                ).alias(r)
                for r in regs
            ],
        )
    return state


def anf_estimate(sketches: DataFrame, registers: int = 4) -> DataFrame:
    """FM cardinality estimate from raw registers: 2^R̄ / 0.77351 where
    R̄ is the mean lowest-unset-bit index across registers (Flajolet &
    Martin 1985). Float math — the oracle-exact surface is the raw
    sketches; this is the human-facing readout."""
    def lowest_zero(col: str) -> Column:
        expr = F.lit(_HASH_BITS + 1)
        for p in range(_HASH_BITS, -1, -1):
            expr = F.when(
                F.col(col).bitwiseAND(F.lit(1 << p).cast("long")) == 0,
                F.lit(p),
            ).otherwise(expr)
        return expr

    regs = [f"s{r}" for r in range(registers)]
    mean_r = sum((lowest_zero(r) for r in regs), F.lit(0)) / float(registers)
    return sketches.select(
        "vid", (F.pow(F.lit(2.0), mean_r) / F.lit(0.77351)).alias("anf_est")
    )
