"""Embedding similarity search over an ``embeddings`` table
(vec_id, embedding array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Query set broadcast, dot products computed JVM-side with
  ``aggregate(zip_with(...))`` (no Python), ranking via a per-query
  window. At 100 TB this is the verifier for the ANN path, run on
  samples.
- ``lsh_bucket_topk``: the scale path — random-hyperplane LSH. Plane
  sign bits derive from md5 parity (deterministic, engine-portable,
  no stored plane matrix); candidates only compete within their
  bucket, cutting the cross join by ~2^n_planes.

Rounding + vec_id tiebreaks make rankings deterministic so results are
oracle-comparable despite float summation order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["dot", "norm", "cosine", "cosine_topk", "hyperplane_bucket", "lsh_bucket_topk"]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.greatest(norm(a) * norm(b), F.lit(1e-12))


def _as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    ``queries``: (query_id, q_embedding). Broadcast (small) against the
    full embeddings scan; rank by (rounded cosine desc, vec_id) for
    determinism. Excludes self-matches on id equality.
    """
    q = queries.select(
        "query_id", _as_double(F.col("q_embedding")).alias("qv")
    )
    e = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("ev"))
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("qv"), F.col("ev")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def hyperplane_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """LSH bucket id: sign bits against n pseudo-random hyperplanes.

    Plane p's weight for dimension d is ±1, chosen by the parity of the
    first hex digit of md5('p|d') — deterministic everywhere, no plane
    matrix to store or broadcast. Bucket = sum of 2^p over positive
    projections.
    """
    bucket = F.lit(0)
    for p in range(n_planes):
        proj = F.lit(0.0)
        for d in range(dim):
            # deterministic ±1 weight (computed at plan build; constant-folded)
            import hashlib

            sign = 1 if int(hashlib.md5(f"{p}|{d}".encode()).hexdigest()[0], 16) % 2 else -1
            proj = proj + F.element_at(vec, d + 1).cast("double") * F.lit(float(sign))
        bucket = bucket + F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0))
    return bucket


def lsh_bucket_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
) -> DataFrame:
    """Approximate top-k: exact ranking within the query's LSH bucket.

    Same output shape as ``cosine_topk``; recall < 1 by design. The
    candidate join is an equi-join on bucket — co-partitioned, no cross
    join of the full corpus.
    """
    e = embeddings.select(
        "vec_id",
        _as_double(F.col("embedding")).alias("ev"),
        hyperplane_bucket(F.col("embedding"), dim, n_planes).alias("bucket"),
    )
    q = queries.select(
        "query_id",
        _as_double(F.col("q_embedding")).alias("qv"),
        hyperplane_bucket(F.col("q_embedding"), dim, n_planes).alias("bucket"),
    )
    scored = (
        e.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("qv"), F.col("ev")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )
