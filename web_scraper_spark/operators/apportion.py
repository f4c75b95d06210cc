"""Exact apportionment of the global crawl budget across hosts.

The reference divides its attention evenly by ITERATION ORDER (one
competitor after another, src/app.py's sequential loop) and its global
batch pause (A3/R2) just truncates whatever order the frontier
happened to be in. At web scale the scheduler wants the opposite: a
FIXED global budget G per round (politeness/io ceiling) divided across
hosts *proportionally to learned priority* (link centrality × fetch
quality, operators/linkgraph.py), not first-come-first-served.

:func:`allocate_budget` implements largest-remainder (Hamilton)
apportionment — the unique proportional split that (a) sums to G
EXACTLY, (b) gives every host either floor(share) or ceil(share)
(no host is ever more than one URL from its ideal share — "quota
rule"), and (c) is deterministic (remainder ties broken by key).

Scale shape: two 1-row scalar aggregates (weight sum, leftover count
L) + one in-row projection (share/floor/remainder) + one top-L
selection over HOST-grain rows. The top-L reuses
:func:`~web_scraper_spark.operators.limits.global_priority_limit`
(range-partitioned distributed sort, no single-partition window, no
driver-side row merge), so the operator holds at 10^8 hosts. The
allocation then feeds the per-host politeness rank filter exactly like
a crawl-delay budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .limits import global_priority_limit

__all__ = ["allocate_budget"]


def allocate_budget(
    weights: DataFrame,
    total: int,
    key_col: str = "host",
    weight_col: str = "priority",
    cap_col: str | None = None,
) -> DataFrame:
    """``(key, weight, allocation)`` with ``sum(allocation) == total``.

    ``weights`` must carry one row per key with a non-negative weight;
    zero-weight keys get 0. If ``cap_col`` is given, each allocation is
    clamped to the cap AFTER apportionment (clamped surplus is NOT
    redistributed — the caller's next-round feedback loop absorbs it;
    single-pass keeps the operator two-scalar-jobs cheap and the sum
    then only bounds ``<= total``).
    """
    if total < 0:
        raise ValueError("total budget must be >= 0")
    w = F.col(weight_col).cast("double")
    wsum = weights.agg(F.sum(F.when(w >= 0, w))).first()[0]
    if wsum is None or wsum <= 0:
        raise ValueError("allocate_budget: total weight must be positive")
    neg = weights.filter(w < 0).limit(1).count()
    if neg:
        raise ValueError("allocate_budget: negative weights")

    shares = weights.select(
        F.col(key_col),
        w.alias("__w"),
        (F.lit(float(total)) * w / F.lit(wsum)).alias("__share"),
        *([F.col(cap_col)] if cap_col else []),
    ).select(
        "*",
        F.floor("__share").cast("long").alias("__base"),
        (F.col("__share") - F.floor("__share")).alias("__rem"),
    )
    # leftover seats: total - sum(floor(share)) == sum of remainders,
    # an integer by construction; 1-row scalar
    leftover = total - (shares.agg(F.sum("__base")).first()[0] or 0)

    handles: list = []
    if leftover > 0:
        # top-L largest remainders, ties by key asc — a range-partitioned
        # distributed selection, NOT a single-partition global window
        bonus_keys = global_priority_limit(
            shares.select(
                key_col, (-F.col("__rem")).alias("__negrem")
            ),
            ["__negrem", key_col],
            int(leftover),
            cache_handles=handles,
        ).select(key_col, F.lit(1).alias("__bonus"))
        out = shares.join(bonus_keys, key_col, "left")
    else:
        out = shares.withColumn("__bonus", F.lit(None).cast("int"))

    alloc = F.col("__base") + F.coalesce(F.col("__bonus"), F.lit(0))
    if cap_col is not None:
        alloc = F.least(alloc, F.col(cap_col).cast("long"))
    result = out.select(
        key_col,
        F.col("__w").alias(weight_col),
        alloc.cast("long").alias("allocation"),
    )
    if handles:
        result = result.localCheckpoint(eager=True)
        for h in handles:
            h.unpersist()
    return result
