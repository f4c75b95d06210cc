"""Redirect-chain resolution and rel=canonical collapse.

The reference follows HTTP redirects implicitly inside its per-request
Selenium/requests loop (src/core/tracker/base_tracker.py drives one
browser; the final URL is whatever the driver lands on). At corpus
scale redirects are DATA: a crawl round produces a (url, redirect_to)
edge table from 3xx fetch results, and the frontier must be rewritten
to final targets before dedup/scheduling — otherwise every hop of a
chain is re-fetched and counted as a distinct page.

``resolve_redirects`` resolves every chain to its terminal URL with
**pointer doubling**: each pass joins the current mapping with itself,
doubling the resolved path length, so an L-hop chain needs only
ceil(log2(L)) shuffles instead of L self-joins. At 100 TB (billions of
edges) that is 4-5 joins for the 16-hop cap browsers enforce, each a
plain hash equi-join on the url key — no driver-side iteration over
rows, no recursion depth tied to data.

Cycles (a -> b -> a) and over-long chains never terminate at a
non-source URL; they are flagged ``is_loop`` once accumulated hops
exceed ``max_hops`` and dropped from the frontier rewrite.

``collapse_canonical`` applies the one-hop rel=canonical mapping pages
declare in <link rel="canonical">: rows group under their canonical
target (self when absent), one representative survives per group
(latest ``warc_ts``, url as tie-break), and the collapsed cardinality
is kept as a dedup metric. Canonical is deliberately NOT chased
transitively — browsers and indexers treat it as a single-hop hint,
and a buggy canonical loop must not eat the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["resolve_redirects", "collapse_canonical"]


def resolve_redirects(
    edges: DataFrame,
    url_col: str = "url",
    to_col: str = "redirect_to",
    max_hops: int = 16,
) -> DataFrame:
    """Resolve every URL to its redirect-chain terminal.

    ``edges``: one row per crawled URL; ``to_col`` is NULL for terminal
    (non-3xx) pages. Returns one row per input URL with

    - ``final_url``: the chain's terminal URL (NULL when ``is_loop``),
    - ``hops``: number of redirects followed (0 for terminal pages),
    - ``is_loop``: chain exceeded ``max_hops`` without terminating
      (cycle or pathologically long chain).

    Pointer doubling: mapping m_k resolves up to 2^k hops; joining m_k
    with itself on (cur -> src) yields m_{k+1}. Rows whose ``cur`` has
    no outgoing edge are already terminal and pass through the left
    join unchanged. ceil(log2(max_hops)) + 1 passes total; each pass is
    one equi-join shuffle on the url key, so a host-partitioned edge
    table keeps every pass co-located.
    """
    # Materialize the narrow (src, to) projection ONCE: the doubling
    # loop and the terminal `outgoing` probe both reuse it, and callers
    # routinely derive `edges` from an expensive upstream stage (the
    # Arrow head-metadata parse in operators/pagination.py) that must
    # not be recomputed per pass. Two string columns — cheap to pin
    # even at frontier scale.
    eproj = edges.select(
        F.col(url_col).alias("src"), F.col(to_col).alias("cur")
    ).localCheckpoint(eager=False)

    # m: src, cur (next unresolved pointer; NULL = src itself terminal), hops
    m = eproj.select(
        "src",
        "cur",
        F.when(F.col("cur").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("hops"),
    )
    passes = max(1, (max_hops - 1).bit_length())  # ceil(log2(max_hops))
    for _ in range(passes):
        nxt = m.select(
            F.col("src").alias("__j_src"),
            F.col("cur").alias("__j_cur"),
            F.col("hops").alias("__j_hops"),
        )
        m = (
            m.join(nxt, m["cur"] == nxt["__j_src"], "left")
            .select(
                "src",
                # unresolved and the pointer itself redirects on: advance
                F.when(
                    F.col("cur").isNotNull() & F.col("__j_cur").isNotNull(),
                    F.col("__j_cur"),
                )
                .otherwise(F.col("cur"))
                .alias("cur"),
                F.when(
                    F.col("cur").isNotNull() & F.col("__j_cur").isNotNull(),
                    F.col("hops") + F.col("__j_hops"),
                )
                .otherwise(F.col("hops"))
                .alias("hops"),
                # did any pointer advance this pass? drives early stop
                (F.col("cur").isNotNull() & F.col("__j_cur").isNotNull()).alias(
                    "__adv"
                ),
            )
            # cap accumulated hops so cycles cannot grow counters unboundedly
            .withColumn(
                "hops",
                F.least(F.col("hops"), F.lit(max_hops + 1)),
            )
            # one job per pass: the advanced-count below materializes
            # this non-eager checkpoint, breaking lineage every pass
            # (the self-join otherwise doubles the plan per pass) and
            # stopping as soon as a pass moves nothing — log2(actual
            # longest chain) passes, not log2(max_hops)
            .localCheckpoint(eager=False)
        )
        advanced = m.filter("__adv").count()
        m = m.drop("__adv")
        if advanced == 0:
            break

    # terminal src: cur is NULL (never redirected) -> final = src, hops 0.
    # resolved chain: cur points at a URL with no outgoing edge -> after
    # doubling, cur stopped advancing; a cur that still has an outgoing
    # edge after `passes` doublings exceeded max_hops -> loop.
    outgoing = eproj.filter(F.col("cur").isNotNull()).select(
        F.col("src").alias("__o_src"), F.lit(True).alias("__redirects_on")
    )
    resolved = (
        m.join(outgoing, m["cur"] == outgoing["__o_src"], "left")
        .select(
            F.col("src").alias(url_col),
            F.when(F.col("__redirects_on").isNotNull() | (F.col("hops") > max_hops), None)
            .otherwise(F.coalesce(F.col("cur"), F.col("src")))
            .alias("final_url"),
            F.when(
                F.col("__redirects_on").isNotNull() | (F.col("hops") > max_hops),
                F.lit(None).cast("int"),
            )
            .otherwise(F.col("hops").cast("int"))
            .alias("hops"),
            (F.col("__redirects_on").isNotNull() | (F.col("hops") > max_hops)).alias(
                "is_loop"
            ),
        )
    )
    return resolved


def collapse_canonical(
    pages: DataFrame,
    url_col: str = "url",
    canonical_col: str = "canonical_url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Collapse rel=canonical duplicate groups to one representative.

    Group key = declared canonical target (the page itself when none is
    declared; a self-canonical declaration is the same as none). Within
    a group the latest ``ts_col`` wins, url ascending as tie-break.
    Output: one row per group with ``canonical`` (group key), ``kept_url``
    (the surviving member), ``n_collapsed`` (group size), and
    ``latest_ts``. One window shuffle on the group key; no join.
    """
    grouped = pages.withColumn(
        "__canon", F.coalesce(F.col(canonical_col), F.col(url_col))
    )
    w = Window.partitionBy("__canon").orderBy(
        F.col(ts_col).desc(), F.col(url_col).asc()
    )
    return (
        grouped.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "n_collapsed", F.count(F.lit(1)).over(Window.partitionBy("__canon"))
        )
        .withColumn("latest_ts", F.max(ts_col).over(Window.partitionBy("__canon")))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("__canon").alias("canonical"),
            F.col(url_col).alias("kept_url"),
            F.col("n_collapsed").cast("long").alias("n_collapsed"),
            "latest_ts",
        )
    )
