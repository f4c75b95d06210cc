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

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "norm",
    "cosine",
    "cosine_topk",
    "plane_sign",
    "hyperplane_bucket",
    "lsh_bucket_topk",
    "embedding_neardup",
    "ivf_topk",
]


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


def plane_sign(p: int, d: int) -> int:
    """±1 weight of hyperplane ``p`` for dimension ``d``: parity of the
    first hex digit of md5('p|d'). Deterministic everywhere — the DuckDB
    oracle emits the same constants as a literal weight table, so the
    bucket assignment is engine-portable with no stored plane matrix."""
    return 1 if int(hashlib.md5(f"{p}|{d}".encode()).hexdigest()[0], 16) % 2 else -1


def hyperplane_bucket(
    vec: Column, dim: int, n_planes: int = 8, plane_offset: int = 0
) -> Column:
    """LSH bucket id: sign bits against n pseudo-random hyperplanes.

    Bucket = sum of 2^p over positive projections. Each projection is a
    single ``aggregate(zip_with(vec, <literal ±1 array>))`` — the
    expression tree stays linear in ``dim`` (codegen-friendly at large
    ``n_planes``), and the left-fold sums elements in index order, the
    same order the SQL twin's ``v[1]*s1 + v[2]*s2 + …`` uses, so the
    float result is bit-identical across engines.

    ``plane_offset`` shifts the plane-index namespace so multi-band
    callers (``embedding_neardup``) draw independent planes per band.
    """
    bucket = F.lit(0)
    for p in range(n_planes):
        weights = F.array(
            *[F.lit(float(plane_sign(plane_offset + p, d))) for d in range(dim)]
        )
        proj = F.aggregate(
            F.zip_with(vec, weights, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0))
    return bucket


def embedding_neardup(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.35,
    n_bands: int = 12,
    planes_per_band: int = 3,
) -> DataFrame:
    """Near-duplicate pairs (cosine ≥ threshold), LSH-bucket-gated.

    The scale path for embedding dedup: never an all-pairs join.
    Multi-band OR construction for recall — a pair is a candidate if it
    shares a bucket in ANY band (band b draws planes
    ``b*planes_per_band … +planes_per_band-1`` from the shared md5-parity
    namespace). Plan shape:

    1. explode each vector to ``n_bands`` (band, bucket) rows,
    2. self-equi-join on (band, bucket) with ``vec_a < vec_b``,
       ``distinct`` to dedup pairs found by several bands — ids only,
       vectors do not ride through the band join,
    3. re-join both sides' vectors by id (co-partitioned equi-joins),
       cosine filter at ``threshold``.

    Output: (vec_a, vec_b, cos_sim rounded to 4). Recall < 1 vs the
    exact all-pairs join by construction; the bound is pinned by a
    recall test against the exact pairs in tests/test_dedup_similarity
    (defaults measure 0.98 on the fixture embeddings at τ=0.35).
    Tuning: more planes/band → smaller buckets (less candidate volume,
    what you raise at corpus scale); more bands → higher recall.
    """
    e = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    bands = e.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        hyperplane_bucket(
                            F.col("v"),
                            dim,
                            planes_per_band,
                            plane_offset=b * planes_per_band,
                        ).alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", "bb.band", "bb.bucket")
    a = bands.select(F.col("vec_id").alias("vec_a"), "band", "bucket")
    b = bands.select(F.col("vec_id").alias("vec_b"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    ea = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    eb = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", "cos_sim")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    n_cells: int = 8,
    n_probe: int = 2,
    k: int = 5,
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize the corpus into
    ``n_cells`` Voronoi cells, probe only the ``n_probe`` closest cells
    per query, rank exactly within the probed cells.

    The second ANN scale path next to ``lsh_bucket_topk`` (IVF trades
    LSH's oblivious hashing for data-adapted cells). Centroids here are
    deterministic seed vectors (``vec_id < n_cells``) — real IVF runs an
    offline k-means to place them, which only changes the centroid
    table, not this plan. Plan shape, sized for a 10^10-vector corpus:

    - the centroid table is collected into ONE array row and broadcast;
      cell assignment is a per-row fold over that array (argmax cosine)
      — zero shuffle, no explode: the corpus scan stays narrow. At a
      realistic nlist (≤ 65k × dim floats ≈ MBs) the array still
      broadcasts.
    - queries (small) pick their ``n_probe`` cells via a window; the
      candidate join is a broadcast equi-join on ``cell_id``, so each
      corpus row is scored against at most the queries probing its own
      cell — never the full query × corpus cross product.

    Scores round to 4 decimals with id tiebreaks (assignment AND
    ranking) so the result is engine-portable despite float summation
    order. Output shape == ``cosine_topk``; recall < 1 by design,
    pinned by a recall test vs the exact baseline.
    """
    e = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("ev"))
    cents = e.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell_id"), F.col("ev").alias("cv")
    )
    cent_arr = cents.agg(
        F.sort_array(F.collect_list(F.struct("cell_id", "cv"))).alias("cells")
    )
    # fold keeps the FIRST maximum; the array is sorted by cell_id, so
    # ties break toward the smaller cell — mirrored by the oracle's
    # ORDER BY score DESC, cell_id
    cell_scores = F.transform(
        F.col("cells"),
        lambda c: F.struct(
            F.round(cosine(F.col("ev"), c["cv"]), 4).alias("s"),
            c["cell_id"].alias("cell_id"),
        ),
    )
    best = F.aggregate(
        cell_scores,
        F.struct(
            F.lit(-2.0).cast("double").alias("s"),
            F.lit(-1).cast("bigint").alias("cell_id"),
        ),
        lambda acc, x: F.when(x["s"] > acc["s"], x).otherwise(acc),
    )
    assigned = (
        e.crossJoin(F.broadcast(cent_arr))
        .select("vec_id", "ev", best["cell_id"].alias("cell_id"))
    )

    q = queries.select("query_id", _as_double(F.col("q_embedding")).alias("qv"))
    qc = q.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "qv",
        "cell_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("s"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("s").desc(), F.col("cell_id").asc()
    )
    probes = (
        qc.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= n_probe)
        .select("query_id", "qv", "cell_id")
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell_id")
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
