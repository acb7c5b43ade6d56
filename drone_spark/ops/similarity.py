"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k — the exact baseline. Dot products run
  JVM-side via ``F.aggregate``/``F.zip_with`` (codegen; no Python), or
  through a numpy matrix kernel when the query set is broadcastable.
- LSH-bucketed ANN (sign random projection) — the scale path: a 100 TB
  corpus can't all-pairs; buckets bound the candidate set and each
  bucket verifies exactly.
- IVF (inverted-file) ANN — k-means-lite coarse quantizer; probes the
  ``n_probe`` nearest centroids only.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def _norm(vec_col: str):
    return F.sqrt(
        F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x * x)
    )


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, rank).

    queries: (query_id, embedding). The query side is broadcast — the
    right plan whenever #queries ≪ corpus (the usual ANN benchmark
    shape); corpus side streams through one codegen'd projection +
    window top-k. Ties broken by neighbor id for determinism."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("qv")
    )
    crossed = embeddings.select(id_col, vec_col).crossJoin(F.broadcast(q))
    scored = crossed.select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        (
            _dot(vec_col, "qv")
            / (_norm(vec_col) * _norm("qv"))
        ).alias("cosine"),
    ).where(F.col("neighbor_id") != F.col(query_id_col))
    # rank on the cosine quantized to 1e-9: engines summing in different
    # orders disagree at ~1e-16, so near-ties would otherwise order
    # differently across harnesses; quantizing makes them exact ties,
    # deterministically broken by neighbor id (ADVICE r1)
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc(F.round("cosine", 9)), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "cosine")
    )


# ---------------------------------------------------------------------------
# sign-random-projection LSH
# ---------------------------------------------------------------------------
def _planes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def planes_for_corpus(n_vectors: int, target_bucket: int = 256) -> int:
    """Scale the hyperplane count with the corpus so expected bucket
    population stays ~``target_bucket``: planes ≈ log2(N / target).

    A fixed plane count is a scale bug — 8 planes = 256 buckets puts
    millions of vectors per bucket at 10^9 rows and the within-bucket
    verification explodes quadratically. With planes growing as log2(N),
    bucket population — and therefore per-bucket all-pairs work — stays
    constant as the corpus grows."""
    import math

    if n_vectors <= target_bucket:
        return 2
    return max(2, math.ceil(math.log2(n_vectors / target_bucket)))


def rp_signature(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 7,
) -> DataFrame:
    """(id, bucket) — sign pattern of n_planes random hyperplanes,
    computed as one numpy matmul per Arrow batch."""
    dim = len(embeddings.select(vec_col).first()[0])
    planes = _planes(dim, n_planes, seed)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        for batch in batches:
            mat = np.vstack(batch[vec_col].to_numpy())
            signs = (mat @ planes.T) > 0
            yield pd.DataFrame(
                {id_col: batch[id_col], "bucket": (signs @ weights).astype(np.int64)}
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        kernel, schema=f"{id_col} long, bucket long"
    )


def cosine_pairs_exact(
    cand: DataFrame,
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Verify candidate pairs (a, b) exactly; keep cosine ≥ threshold."""
    e = embeddings.select(F.col(id_col), F.col(vec_col))
    return (
        cand.join(e.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va")), "a")
        .join(e.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb")), "b")
        .withColumn("cosine", _dot("va", "vb") / (_norm("va") * _norm("vb")))
        .where(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def cosine_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int | None = None,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    target_bucket: int = 256,
) -> DataFrame:
    """Approximate top-k: only corpus vectors sharing a query's RP
    bucket in at least one of ``n_tables`` independent hash tables are
    scored (multi-table LSH: recall compounds as 1-(1-p)^L while the
    candidate set stays a union of bucket joins — never all-pairs).
    ``n_planes`` defaults to ``planes_for_corpus(count)`` so bucket
    population tracks the corpus size. Recall measured by tests vs
    brute force (≥0.8 at test scale)."""
    if n_planes is None:
        n_planes = planes_for_corpus(embeddings.count(), target_bucket)
    def sigs(df, idc):
        parts = []
        for t in range(n_tables):
            s = rp_signature(df, idc, vec_col, n_planes, seed=7 + 31 * t)
            parts.append(
                s.select(idc, (F.lit(t * (2 ** n_planes)) + F.col("bucket")).alias("bucket"))
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    sig_c = sigs(embeddings.select(id_col, vec_col), id_col)
    sig_q = sigs(
        queries.select(F.col(query_id_col).alias(id_col), vec_col), id_col
    ).select(F.col(id_col).alias(query_id_col), "bucket")
    cand = (
        sig_q.join(sig_c, "bucket")
        .select(query_id_col, F.col(id_col).alias("neighbor_id"))
        .where(F.col("neighbor_id") != F.col(query_id_col))
        .distinct()
    )
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("qv"))
    e = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    scored = (
        cand.join(F.broadcast(q), query_id_col)
        .join(e, "neighbor_id")
        .withColumn("cosine", _dot("nv", "qv") / (_norm("nv") * _norm("qv")))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc(F.round("cosine", 9)), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF — inverted-file coarse quantization
# ---------------------------------------------------------------------------
def ivf_assign(
    embeddings: DataFrame,
    n_cells: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> tuple[DataFrame, np.ndarray]:
    """Lloyd's k-means (few iterations, sampled init) → (id, cell).

    Centroid updates aggregate executor-side (groupBy cell + avg over
    posexploded components); only the small centroid matrix hits the
    driver per iteration — never the vectors."""
    sample = np.vstack(
        [r[0] for r in embeddings.select(vec_col).limit(4096).collect()]
    )
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), n_cells, replace=False)]

    def assign_kernel(cent: np.ndarray):
        def k(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for batch in batches:
                mat = np.vstack(batch[vec_col].to_numpy())
                d = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
                yield pd.DataFrame(
                    {id_col: batch[id_col], "cell": d.argmin(1).astype(np.int32)}
                )
        return k

    for _ in range(n_iter):
        assigned = embeddings.mapInPandas(
            assign_kernel(centroids), schema=f"{id_col} long, cell int"
        )
        comp = (
            embeddings.join(assigned, id_col)
            .select("cell", F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        for row in comp:
            centroids[row["cell"], row["pos"]] = row["m"]
    final = embeddings.mapInPandas(
        assign_kernel(centroids), schema=f"{id_col} long, cell int"
    )
    return final, centroids


def cosine_topk_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF ANN: score only vectors in the ``n_probe`` cells whose
    centroids are nearest each query. The corpus-side cell assignment is
    a one-time index (persist/write it in production); per query the
    candidate set shrinks ~n_probe/n_cells. Recall measured by tests."""
    assigned, centroids = ivf_assign(embeddings, n_cells=n_cells, id_col=id_col, vec_col=vec_col)
    spark = embeddings.sparkSession
    q_rows = queries.select(query_id_col, vec_col).collect()
    probes = []
    for r in q_rows:
        qv = np.asarray(r[vec_col], dtype=np.float64)
        d = ((centroids - qv) ** 2).sum(axis=1)
        for cell in np.argsort(d)[:n_probe]:
            probes.append((r[query_id_col], int(cell)))
    probe_df = spark.createDataFrame(probes, f"{query_id_col} long, cell int")
    cand = (
        F.broadcast(probe_df).alias("p")
        .join(assigned.alias("a"), "cell")
        .select(query_id_col, F.col(id_col).alias("neighbor_id"))
        .where(F.col("neighbor_id") != F.col(query_id_col))
    )
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("qv"))
    e = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    scored = (
        cand.join(F.broadcast(q), query_id_col)
        .join(e, "neighbor_id")
        .withColumn("cosine", _dot("nv", "qv") / (_norm("nv") * _norm("qv")))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc(F.round("cosine", 9)), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "cosine")
    )
