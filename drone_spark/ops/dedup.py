"""Deduplication operators — exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Shapes chosen for 100 TB: every method is candidate-generation by a
shuffle-friendly equi-join key (hash bucket / band signature / shared
shingle) followed by verification on the candidates only — never an
all-pairs comparison. All signature math is either JVM expressions
(xxhash64 is codegen'd) or Arrow-batched numpy.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .textstats import norm_text


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep the minimum doc_id per normalized-text hash group.

    Result: (doc_id, fingerprint, group_size) — one row per *kept*
    document. groupBy on a 128-bit hash: no skew (hash keys uniform),
    partial-agg friendly."""
    return (
        docs.select("doc_id", F.md5(norm_text(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .select("doc_id", "fingerprint", "group_size")
    )


# ---------------------------------------------------------------------------
# shingles (shared by minhash / jaccard)
# ---------------------------------------------------------------------------
def shingles(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle).

    Built from ``split`` + ``transform``+``slice`` array ops — pure
    Catalyst, no Python."""
    toks = F.split(norm_text(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return (
        docs.select("doc_id", F.explode(F.array_distinct(grams)).alias("shingle"))
        .where(F.length("shingle") > 0)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard dedup (exact verification via shared-shingle candidates)
# ---------------------------------------------------------------------------
def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.8, text_col: str = "text", n: int = 3
) -> DataFrame:
    """All pairs (a < b) with shingle-set Jaccard ≥ threshold.

    intersection via shared-shingle self-join + count (only docs that
    share ≥1 shingle ever meet — candidate generation IS the join);
    union by inclusion-exclusion from per-doc set sizes."""
    sh = shingles(docs, text_col, n).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb")), "b")
        .withColumn("jaccard", F.col("i") / (F.col("sza") + F.col("szb") - F.col("i")))
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def minhash_signatures(
    docs: DataFrame, num_hashes: int = 64, text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc_id, sig: array<long>) — min over shingles of xxhash64(shingle, seed_i).

    One explode + groupBy; the num_hashes mins are computed as a single
    ``min(array)`` aggregation of per-shingle hash arrays (JVM-side)."""
    sh = shingles(docs, text_col, n)
    hashes = F.array(
        *[F.xxhash64(F.col("shingle"), F.lit(i)) for i in range(num_hashes)]
    )
    per_shingle = sh.select("doc_id", hashes.alias("hs"))
    # element-wise min across rows: aggregate with zip_with(least)
    return per_shingle.groupBy("doc_id").agg(
        F.aggregate(
            F.collect_list("hs"),
            F.array(*[F.lit(2**63 - 1).cast("long")] * num_hashes),
            lambda acc, x: F.zip_with(acc, x, lambda p, q: F.least(p, q)),
        ).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Near-dup pairs via banded LSH over MinHash signatures.

    bucket key = (band index, hash of the band's rows); candidates =
    docs sharing a bucket; verification = estimated Jaccard from full
    signature agreement ≥ threshold. Scale shape: bucket join only —
    never all-pairs; hot buckets (boilerplate text) are bounded by the
    band hash's 64-bit range and AQE skew splitting."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes, text_col, n).persist()
    bands_df = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", i * rows_per_band + j + 1)
                                    for j in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    cand = (
        bands_df.alias("x")
        .join(bands_df.alias("y"), ["band", "bucket"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
        )
        .distinct()
    )
    verified = (
        cand.join(sigs.select(F.col("doc_id").alias("a"), F.col("sig").alias("siga")), "a")
        .join(sigs.select(F.col("doc_id").alias("b"), F.col("sig").alias("sigb")), "b")
        .withColumn(
            "est_jaccard",
            F.size(
                F.filter(
                    F.zip_with("siga", "sigb", lambda p, q: (p == q).cast("int")),
                    lambda v: v == 1,
                )
            )
            / F.lit(num_hashes),
        )
        .where(F.col("est_jaccard") >= threshold)
        .select("a", "b", "est_jaccard")
    )
    return verified


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash over whitespace tokens (Arrow-batched numpy kernel:
    per-token 64-bit hashes -> bit-vote matrix -> sign)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        masks = (1 << np.arange(64, dtype=np.uint64))
        for batch in batches:
            out = np.zeros(len(batch), dtype=np.int64)
            for row_i, text in enumerate(batch[text_col]):
                toks = (text or "").lower().split()
                if not toks:
                    continue
                hs = np.array(
                    [
                        int.from_bytes(
                            __import__("hashlib").md5(t.encode()).digest()[:8], "little"
                        )
                        for t in toks
                    ],
                    dtype=np.uint64,
                )
                bits = ((hs[:, None] & masks[None, :]) != 0).sum(axis=0)
                votes = bits * 2 > len(toks)
                out[row_i] = int.from_bytes(
                    np.packbits(votes.astype(np.uint8), bitorder="little").tobytes(),
                    "little",
                    signed=True,
                )
            yield pd.DataFrame({"doc_id": batch["doc_id"], "simhash": out})

    return docs.select("doc_id", text_col).mapInPandas(
        kernel, schema="doc_id long, simhash long"
    )


def simhash_near_dups(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text"
) -> DataFrame:
    """Pairs with SimHash Hamming distance ≤ max_hamming.

    Candidate generation: split the 64-bit hash into max_hamming+1
    16-bit blocks — any pair within distance k agrees on ≥1 block
    (pigeonhole), so candidates = equi-join per block. JVM-side popcount
    via bit_count for verification."""
    sh = simhash(docs, text_col).persist()
    n_blocks = max_hamming + 1
    block_bits = 64 // n_blocks
    blocks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned(F.col("simhash"), i * block_bits)
                        .bitwiseAND(F.lit((1 << block_bits) - 1))
                        .alias("key"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.blk", "bb.key")
    cand = (
        blocks.alias("x")
        .join(blocks.alias("y"), ["blk", "key"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("a"),
            F.col("y.doc_id").alias("b"),
            F.col("x.simhash").alias("ha"),
            F.col("y.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------
def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairs with cosine similarity ≥ threshold, verified exactly.

    Candidates here are all pairs within a hash bucket of the
    sign-random-projection sketch (8 hyperplanes -> 256 buckets, exact
    check inside buckets). Near-duplicates almost always share the full
    sketch; the pytest oracle measures recall vs brute force."""
    from .similarity import rp_signature, cosine_pairs_exact

    sig = rp_signature(embeddings, id_col=id_col, vec_col=vec_col, n_planes=8)
    cand = (
        sig.alias("x")
        .join(sig.alias("y"), "bucket")
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b")
        )
    )
    return cosine_pairs_exact(cand, embeddings, threshold, id_col, vec_col)
