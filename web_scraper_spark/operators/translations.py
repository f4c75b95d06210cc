"""Translation-set clustering from ``hreflang`` alternates.

``<link rel="alternate" hreflang>`` groups (extracted by
operators/headmeta.py) declare which pages are translations of each
other. Real-world declarations are sloppy — a member may list only one
sibling, declarations are often one-directional — so the honest cluster
is the TRANSITIVE closure over the declared edges, not the per-page
list. Translation clusters matter to a webtext pipeline twice: they
cross-check language-ID (a page clustered as the ``tr`` member whose
detected language is English is a mislabel signal), and they let corpus
mixing sample one member per cluster instead of near-identical content
in N languages.

Implementation: explode the per-page hreflang array into edges, then
min-label connected components (operators/components.py — the same
machinery as dedup clustering: 1-2 equi-join shuffles per iteration
over the EDGE set, localCheckpoint lineage breaks, early stop). Nodes
are URLs on both sides, so declared-but-uncrawled alternates still join
their cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .components import connected_components

__all__ = ["hreflang_clusters"]


def hreflang_clusters(
    meta: DataFrame, url_col: str = "url", hreflang_col: str = "hreflang"
) -> DataFrame:
    """(url, cluster, cluster_size) for every URL in any hreflang group.

    ``cluster`` is the lexicographically-smallest member URL (stable
    across runs and cluster shape); ``cluster_size`` counts distinct
    member URLs, declared targets included. Pages declaring no
    alternates do not appear — absence of a row means "not part of any
    translation set".
    """
    edges = (
        meta.select(
            F.col(url_col).alias("src"),
            F.explode(F.col(hreflang_col)).alias("a"),
        )
        .select("src", F.col("a.href").alias("dst"))
        .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
    )
    comp = connected_components(edges)
    # size via a count window — one shuffle on the cluster key instead
    # of a separate aggregate plus a join back
    w = Window.partitionBy("component")
    return comp.select(
        F.col("node").alias("url"),
        F.col("component").alias("cluster"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )
