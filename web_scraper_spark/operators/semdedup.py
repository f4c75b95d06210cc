"""SemDeDup-style semantic deduplication: cluster, then prune within.

Implements the pruning scheme of Abbas et al., *SemDeDup: Data-
efficient learning at web-scale through semantic deduplication*
(arXiv:2303.09540): coarse-cluster the embedding space, compute
pairwise cosine only WITHIN each cluster, and drop every item that has
a semantic duplicate (cosine >= tau) with a lower id in its cluster —
so exactly one representative (the lowest id) of each near-duplicate
group inside a cluster survives.

Scale shape (the paper's own argument, re-expressed in DataFrame ops):

- cluster assignment is the IVF path from ``similarity.py`` — the
  centroid table collapses to ONE broadcast array row and assignment
  is an in-row fold (argmax cosine), zero shuffle over the corpus;
- the duplicate test is an equi-join ON ``cell_id`` with an id
  inequality — pair work is sum(cluster_size^2), never corpus^2. At
  10^10 embeddings with k ~ 10^5 balanced clusters that is ~10^15/k
  comparisons spread over the cluster key, each cluster's pairs
  co-located by the join's hash partitioning;
- per-item reduction is one max-agg on the left id.

Determinism contract (shared with the DuckDB oracle, which computes
assignment by the independent CROSS JOIN + row_number method):
assignment and pair cosines round to 4 decimals; assignment ties break
to the LOWEST cell id; the keep rule compares the ROUNDED cosine to
``tau``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _as_double, cosine


def assign_cells(
    embeddings: DataFrame, centroids: DataFrame | None = None, n_cells: int = 8
) -> DataFrame:
    """(vec_id, ev, cell_id): broadcast-array argmax assignment.

    ``centroids`` needs columns (cell_id, cv); defaults to the
    deterministic seed centroids (``vec_id < n_cells``), the oracle-
    parity path shared with ``ivf_topk``.
    """
    e = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("ev"))
    if centroids is None:
        centroids = e.filter(F.col("vec_id") < n_cells).select(
            F.col("vec_id").alias("cell_id"), F.col("ev").alias("cv")
        )
    cent_arr = centroids.agg(
        F.sort_array(F.collect_list(F.struct("cell_id", "cv"))).alias("cells")
    )
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
    return e.crossJoin(F.broadcast(cent_arr)).select(
        "vec_id", "ev", best["cell_id"].alias("cell_id")
    )


def semdedup_prune(
    embeddings: DataFrame,
    tau: float = 0.9,
    n_cells: int = 8,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Per-vector keep/drop decision with its evidence.

    Returns (vec_id, cell_id, max_cos_lower, keep): ``max_cos_lower``
    is the round-4 max cosine to any LOWER-id member of the same
    cluster (null when the vector is its cluster's lowest id), and
    ``keep`` is false iff that max reaches ``tau``.
    """
    assigned = assign_cells(embeddings, centroids=centroids, n_cells=n_cells)
    left = assigned.select("cell_id", "vec_id", "ev")
    right = assigned.select(
        "cell_id",
        F.col("vec_id").alias("other_id"),
        F.col("ev").alias("ov"),
    )
    pair_max = (
        left.join(right, "cell_id")
        .filter(F.col("other_id") < F.col("vec_id"))
        .select(
            "vec_id",
            F.round(cosine(F.col("ev"), F.col("ov")), 4).alias("cos"),
        )
        .groupBy("vec_id")
        .agg(F.max("cos").alias("max_cos_lower"))
    )
    return (
        assigned.join(pair_max, "vec_id", "left")
        .select(
            "vec_id",
            "cell_id",
            "max_cos_lower",
            F.coalesce(F.col("max_cos_lower") < F.lit(tau), F.lit(True)).alias(
                "keep"
            ),
        )
    )
