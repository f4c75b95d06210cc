"""Anchor-text aggregation over the outlink graph.

The reference stores each page in isolation (MongoDB upserts in
src/infrastructure/repository/*.py); it never aggregates what OTHER
pages say about a URL. For a web-scale corpus the inbound anchor texts
of a page are a first-class ranking and labeling signal (the classic
"query-independent evidence" of web IR): they summarize a page in the
words of the pages that link to it, and they exist for pages the
crawler has not fetched yet — so they also prioritize the frontier.

``top_anchor_texts`` reduces the (src, dst, anchor) edge table the
extraction stage already produces to the top-k most frequent anchor
strings per target URL. Shape at 100 TB: one map-side-combinable
count aggregation on (dst, anchor) followed by a per-dst window rank —
two shuffles on keys the link table is naturally skew-salted on, and
the literal ``rank <= k`` predicate fires Spark's WindowGroupLimit
pushdown so each partition keeps only k rows per dst before the final
shuffle (same plan shape as the politeness budget,
operators/politeness.py:134).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["top_anchor_texts"]


def top_anchor_texts(
    links: DataFrame,
    k: int = 3,
    dst_col: str = "dst",
    anchor_col: str = "anchor",
    min_count: int = 1,
) -> DataFrame:
    """Top-k anchor texts per target URL.

    Anchors are trimmed and lowercased (anchor text is display text;
    case variants are the same signal), empties dropped. Ties break on
    anchor text ascending so output is deterministic. Returns
    ``(dst, anchor, n_refs, anchor_rank)``.
    """
    cleaned = (
        links.select(
            F.col(dst_col).alias("dst"),
            F.lower(F.trim(F.col(anchor_col))).alias("anchor"),
        )
        .filter(F.col("anchor").isNotNull() & (F.col("anchor") != ""))
    )
    counts = cleaned.groupBy("dst", "anchor").agg(
        F.count(F.lit(1)).cast("long").alias("n_refs")
    )
    if min_count > 1:
        counts = counts.filter(F.col("n_refs") >= min_count)
    w = Window.partitionBy("dst").orderBy(F.col("n_refs").desc(), F.col("anchor").asc())
    return (
        counts.withColumn("anchor_rank", F.row_number().over(w))
        .filter(F.col("anchor_rank") <= F.lit(int(k)))
        .select("dst", "anchor", "n_refs", F.col("anchor_rank").cast("int").alias("anchor_rank"))
    )
