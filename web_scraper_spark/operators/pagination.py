"""Pagination-chain reconstruction from ``rel=next`` hints.

Listing pages on the public web paginate with ``<link rel="next">``
(extracted by operators/headmeta.py); a crawler that understands the
chain can fetch page 1 of a series at listing priority and the tail at
archive priority, dedupe "page 2+" URLs out of quality sampling, and
bound traps (an infinite calendar is an unbounded pagination chain).
The reference scraper walks Nausys listing pagination imperatively
(SURVEY §2 S3, src/core/tracker/nausys_tracker.py); this is the
set-based generalization.

Chains are reconstructed BACKWARD: the predecessor map (who declares
``next`` = me) is inverted from the next-edges, then pointer doubling
(operators/redirects.py:resolve_redirects — log2(max_len) equi-join
passes, never a row-at-a-time walk) resolves every page to its chain
head; the hop count IS the page's position. A final count per head
attaches chain length.

Scale notes: one inversion shuffle + the doubling joins on the URL key
+ one count shuffle — all equi-joins on keys a host-partitioned layout
co-locates. Branching (two pages declaring the same ``next`` target,
which the spec does not sanction) is resolved deterministically to the
lexicographically-smallest predecessor so the chain stays linear; a
cycle trips ``is_loop`` after ``max_hops`` doublings instead of hanging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .redirects import resolve_redirects

__all__ = ["pagination_chains"]


def pagination_chains(
    meta: DataFrame,
    url_col: str = "url",
    next_col: str = "next_href",
    max_hops: int = 64,
) -> DataFrame:
    """One row per input page: ``(url, chain_head, position, chain_len,
    is_loop)``.

    ``chain_head`` is the first page of the series (a page with no
    predecessor is its own head, position 0); ``position`` the 0-based
    index within the chain; ``chain_len`` the number of INPUT pages in
    the chain (a dangling ``next`` pointing outside the input does not
    count). ``is_loop`` marks pages whose backward walk exceeded
    ``max_hops`` (a pagination cycle); their head is NULL.
    """
    # Materialize the two-column projection once: `meta` is typically
    # the output of the Arrow head-metadata parse over raw HTML, and it
    # feeds THREE consumers below (the inversion agg, the node list,
    # and — through resolve_redirects — the doubling loop). Without the
    # lineage break each consumer would re-run the parse.
    pages = meta.select(
        F.col(url_col).alias("url"), F.col(next_col).alias("next_href")
    ).localCheckpoint(eager=False)
    # invert: predecessor(u) = min page declaring next = u, u in input
    preds = (
        pages.filter(F.col("next_href").isNotNull())
        .groupBy(F.col("next_href").alias("url"))
        .agg(F.min("url").alias("prev_url"))
    )
    back = pages.select("url").join(preds, "url", "left")
    resolved = resolve_redirects(
        back, url_col="url", to_col="prev_url", max_hops=max_hops
    )
    heads = resolved.select(
        "url",
        F.col("final_url").alias("chain_head"),
        F.col("hops").alias("position"),
        "is_loop",
    )
    sizes = heads.filter(~F.col("is_loop")).groupBy("chain_head").agg(
        F.count("*").alias("chain_len")
    )
    return heads.join(sizes, "chain_head", "left").select(
        "url", "chain_head", "position", "chain_len", "is_loop"
    )
