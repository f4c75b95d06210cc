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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "norm",
    "cosine",
    "cosine_topk",
    "plane_sign",
    "plane_matrix",
    "hyperplane_bucket",
    "band_buckets",
    "lsh_bucket_topk",
    "embedding_neardup",
    "kmeans_centroids",
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
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    ``queries``: (query_id, q_embedding). Broadcast (small) against the
    full embeddings scan; rank by (rounded cosine desc, vec_id) for
    determinism.

    ``exclude_self`` drops rows where ``vec_id == query_id`` — correct
    ONLY when query ids live in the corpus id namespace (queries drawn
    from the corpus, the default here and in the battery). When query
    ids come from an independent namespace, a collision would silently
    drop a legitimate neighbor: pass ``exclude_self=False``
    (tests/test_dedup_similarity pins both behaviors on a disjoint-id
    fixture).
    """
    q = queries.select(
        "query_id", _as_double(F.col("q_embedding")).alias("qv")
    )
    e = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("ev"))
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(~F.lit(exclude_self) | (F.col("vec_id") != F.col("query_id")))
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


def plane_matrix(
    n_bands: int, planes_per_band: int, dim: int
) -> list[list[list[float]]]:
    """The md5-parity hyperplane weights as data, shaped
    ``[band][plane][dim]`` — band ``b`` holds planes
    ``b*planes_per_band … +planes_per_band-1`` of the shared namespace,
    exactly the planes ``hyperplane_bucket(plane_offset=b*ppb)`` uses."""
    return [
        [
            [float(plane_sign(b * planes_per_band + p, d)) for d in range(dim)]
            for p in range(planes_per_band)
        ]
        for b in range(n_bands)
    ]


def band_buckets(
    vectors: DataFrame,
    vec_col: str,
    dim: int,
    n_bands: int,
    planes_per_band: int,
    keep_vec: bool = False,
) -> DataFrame:
    """All (band, bucket) assignments per vector in ONE Arrow-batched
    vectorized stage — the multi-band replacement for per-band
    ``hyperplane_bucket`` calls.

    ``hyperplane_bucket`` inlines n_planes × dim literal weights into
    nested higher-order functions; HOFs are not whole-stage-codegen
    supported, so at multi-band settings (12×3×64 ≈ 2,300 terms/row) the
    interpreted evaluator pays ~µs per element-op — measured 7.4 s for
    2,000 vectors. Here the whole plane bank is one numpy matrix and the
    stage is a vectorized ``pandas_udf`` (array<double> in, array<int>
    of ``n_bands`` buckets out): ~ms for the same input, and the Arrow
    transfer is the narrow (id, vector) projection only.

    Bit-identical to the JVM fold by construction, not by luck: the
    projection accumulates ``acc += v[d] * w[d]`` in ascending dim
    order — element-wise IEEE-754 double ops in exactly the left-fold
    order of ``hyperplane_bucket`` and of the SQL twin's
    ``v[1]*s1 + v[2]*s2 + …`` — so every intermediate rounding matches
    and the sign test agrees everywhere (pinned by
    tests/test_dedup_similarity equality test vs ``hyperplane_bucket``).

    Output: input columns minus ``vec_col`` (kept when ``keep_vec``),
    plus (band int, bucket int) — ``n_bands`` rows per vector.
    """
    from pyspark.sql.types import ArrayType, IntegerType

    # [dim][total_planes] weight matrix, plane-major in the shared
    # md5-parity namespace (band b = planes b*ppb .. b*ppb+ppb-1)
    total = n_bands * planes_per_band
    W = np.array(
        [[float(plane_sign(p, d)) for p in range(total)] for d in range(dim)],
        dtype=np.float64,
    )
    pow2 = np.array([1 << p for p in range(planes_per_band)], dtype=np.int64)

    @F.pandas_udf(ArrayType(IntegerType()))
    def _buckets(vecs: pd.Series) -> pd.Series:
        X = np.array(vecs.tolist(), dtype=np.float64)  # (n, dim)
        acc = np.zeros((X.shape[0], total), dtype=np.float64)
        for d in range(dim):  # ascending-dim accumulation == JVM fold
            acc += X[:, d : d + 1] * W[d]
        signs = (acc > 0).reshape(-1, n_bands, planes_per_band)
        buckets = (signs * pow2).sum(axis=2)  # (n, n_bands)
        return pd.Series(buckets.astype(np.int32).tolist())

    keep = [c for c in vectors.columns if c != vec_col]
    if keep_vec:
        keep.append(vec_col)
    return (
        vectors.select(*keep, _buckets(F.col(vec_col)).alias("_bk"))
        .select(*keep, F.posexplode("_bk").alias("band", "bucket"))
    )


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

    1. one Arrow stage assigns each vector its ``n_bands``
       (band, bucket) rows (``band_buckets``, vectors riding),
    2. ONE shuffle groups by (band, bucket); inside each group a
       vectorized gram computation scores every in-bucket pair and
       emits only pairs at/above threshold — never an all-pairs join,
       and no ids-only candidate materialization + vector re-join,
    3. ``distinct`` dedups pairs found by several bands (identical
       doubles — the score is deterministic).

    Scoring parity: the group kernel accumulates ``gram += outer(x_d,
    x_d)`` and ``norm² += x_d²`` in ascending dim order — element-wise
    IEEE-754 double ops in exactly the left-fold order of ``cosine()``
    and the SQL twin — so every cosine is bit-identical to the JVM
    expression and the in-kernel prefilter uses a half-ulp margin with
    the EXACT rounded filter applied Spark-side (same ``F.round``).

    Output: (vec_a, vec_b, cos_sim rounded to 4). Recall < 1 vs the
    exact all-pairs join by construction; the bound is pinned by a
    recall test against the exact pairs in tests/test_dedup_similarity
    (defaults measure 0.98 on the fixture embeddings at τ=0.35).
    Tuning: more planes/band → smaller buckets (less per-group m² work,
    what you raise at corpus scale — group memory is O(m·dim + m²));
    more bands → higher recall.
    """
    bands = band_buckets(
        embeddings.select(
            "vec_id", _as_double(F.col("embedding")).alias("v")
        ),
        "v",
        dim,
        n_bands,
        planes_per_band,
        keep_vec=True,
    )
    margin = threshold - 5e-5  # superset of the rounded >= threshold set

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        m = len(ids)
        if m < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "raw_cos": []})
        X = np.array(pdf["v"].tolist(), dtype=np.float64)
        gram = np.zeros((m, m), dtype=np.float64)
        nsq = np.zeros(m, dtype=np.float64)
        for d in range(dim):  # ascending-dim accumulation == JVM fold
            col = X[:, d]
            gram += np.outer(col, col)
            nsq += col * col
        nrm = np.sqrt(nsq)
        cos = gram / np.maximum(np.outer(nrm, nrm), 1e-12)
        ia, ib = np.triu_indices(m, 1)  # ids ascending -> vec_a < vec_b
        keep = cos[ia, ib] >= margin
        return pd.DataFrame(
            {
                "vec_a": ids[ia[keep]],
                "vec_b": ids[ib[keep]],
                "raw_cos": cos[ia[keep], ib[keep]],
            }
        )

    pairs = bands.groupBy("band", "bucket").applyInPandas(
        score_bucket, "vec_a bigint, vec_b bigint, raw_cos double"
    )
    return (
        pairs.select(
            "vec_a", "vec_b", F.round("raw_cos", 4).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )


def kmeans_centroids(
    embeddings: DataFrame,
    n_cells: int = 8,
    n_iter: int = 5,
) -> DataFrame:
    """Offline Lloyd's k-means producing the IVF centroid table
    (cell_id, cv array<double>) — the data-adapted replacement for
    ``ivf_topk``'s seed-vector default.

    Spherical variant (assignment by max cosine, matching the probe
    metric). Per iteration, two distributed steps and zero
    corpus-sized driver traffic:

    - assign: one vectorized Arrow stage (numpy ``X @ C.T`` argmax —
      the centroid bank is a closure constant, n_cells × dim doubles);
    - update: ``posexplode`` + ``groupBy(cell, pos).avg`` — map-side
      partial aggregation, then only n_cells × dim mean rows reach the
      driver to refresh the bank.

    Portability: assignment cosines round to 4 decimals before argmax
    (ties to the lowest cell — the same contract as ``ivf_topk``) and
    centroid components round to 9 decimals each iteration, so
    shuffle-order float jitter cannot leak into decisions and a DuckDB
    twin unrolling the iterations reproduces the centroids exactly
    (battery ``ann_ivf_kmeans_topk``); empty cells keep their previous
    centroid. At corpus
    scale run this on a sample — centroid placement needs no full
    scan, and the output table is what ``ivf_topk(centroids=...)``
    consumes.
    """
    from pyspark.sql.types import IntegerType

    e = embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    init = (
        e.orderBy("vec_id").limit(n_cells).select("v").collect()
    )
    C = np.array([r["v"] for r in init], dtype=np.float64)

    for _ in range(n_iter):
        Ct = C.T.copy()  # (dim, cells)
        csq = (C * C).sum(axis=1)

        @F.pandas_udf(IntegerType())
        def _assign(vecs: pd.Series) -> pd.Series:
            # portable-assignment contract (same recipe as ivf_topk):
            # cos = dot/(|x||c|) rounded to 4 decimals before argmax,
            # first-max (= lowest cell) on ties — so a SQL twin using
            # round(list_dot_product/..., 4) with ORDER BY s DESC, cell
            # reproduces every assignment decision
            X = np.array(vecs.tolist(), dtype=np.float64)
            dots = X @ Ct
            xsq = (X * X).sum(axis=1)
            denom = np.maximum(
                np.sqrt(xsq)[:, None] * np.sqrt(csq)[None, :], 1e-12
            )
            cos = np.round(dots / denom, 4)
            return pd.Series(cos.argmax(axis=1).astype(np.int32))

        means = (
            e.select(_assign("v").alias("cell"), F.posexplode("v"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg("col"), 9).alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
            .collect()
        )
        for r in means:
            C[r["cell"]] = r["cv"]

    spark = embeddings.sparkSession
    return spark.createDataFrame(
        [(i, [float(x) for x in C[i]]) for i in range(n_cells)],
        "cell_id bigint, cv array<double>",
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    n_cells: int = 8,
    n_probe: int = 2,
    k: int = 5,
    exclude_self: bool = True,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize the corpus into
    ``n_cells`` Voronoi cells, probe only the ``n_probe`` closest cells
    per query, rank exactly within the probed cells.

    The second ANN scale path next to ``lsh_bucket_topk`` (IVF trades
    LSH's oblivious hashing for data-adapted cells). Centroids default to
    deterministic seed vectors (``vec_id < n_cells``, the
    oracle-parity path); pass ``centroids=kmeans_centroids(...)`` for
    data-adapted placement — only the centroid table changes, not this
    plan (recall gain pinned in tests/test_dedup_similarity). Plan shape, sized for a 10^10-vector corpus:

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
    if centroids is not None:
        cents = centroids.select("cell_id", F.col("cv").alias("cv"))
    else:
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
        .filter(~F.lit(exclude_self) | (F.col("vec_id") != F.col("query_id")))
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
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: exact ranking within the query's LSH bucket.

    Same output shape as ``cosine_topk``; recall < 1 by design. The
    candidate join is an equi-join on bucket — co-partitioned, no cross
    join of the full corpus. ``exclude_self``: same shared-id contract
    as ``cosine_topk`` — set False when query ids are an independent
    namespace.
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
        .filter(~F.lit(exclude_self) | (F.col("vec_id") != F.col("query_id")))
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
