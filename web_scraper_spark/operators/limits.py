"""Distributed global top-G selection (scalable ordered-limit).

``df.orderBy(keys).limit(G)`` compiles to TakeOrderedAndProject: every
partition ships its top-G to the driver, which merges K*G rows — fine
for thousands, driver-bound when the global politeness budget is
millions (10^10-frontier rounds). ``global_priority_limit`` produces the
IDENTICAL row set with bounded driver traffic:

1. range-partition by the priority keys + sort within partitions
   (Spark's distributed sort machinery, sampled range boundaries);
2. per-partition row counts → driver (P integers, not rows);
3. partitions wholly under the cumulative budget pass through untouched;
   the single boundary partition takes a small ordered-limit for the
   remainder; later partitions drop.

Exactness: range partitioning puts every row of partition i before
every row of partition i+1 in key order, so whole-partition keeps plus
a boundary trim reproduce the global top-G (keys must be a total order
— include a unique tiebreak column, as the frontier priority key does
with ``url``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["global_priority_limit"]


def global_priority_limit(
    df: DataFrame,
    keys: list[str],
    limit: int,
    num_partitions: int | None = None,
    cache_handles: list | None = None,
) -> DataFrame:
    """Rows of the global top-``limit`` by ``keys`` (ascending).

    The intermediate range-sorted frame is cached (the count pass and
    the filter pass must see identical partition boundaries); it is
    appended to ``cache_handles`` so the caller can ``unpersist()`` it
    once the result is consumed.
    """
    if limit <= 0:
        return df.limit(0)
    P = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    from pyspark import StorageLevel

    ranged = (
        df.repartitionByRange(P, *[F.col(k).asc() for k in keys])
        .sortWithinPartitions(*[F.col(k).asc() for k in keys])
        .withColumn("__pid", F.spark_partition_id())
        # SERIALIZED persist, not .cache(): the range boundaries are
        # sampled, so the two passes (count, filter) must see one
        # materialization — but deserialized JVM rows blow the frontier
        # up ~10x (measured 8.4 GB for a 1.12M-row selection on a 12 GiB
        # heap: storage squeezed execution until the downstream hash
        # aggregate threw AGGREGATE_OUT_OF_MEMORY). Serialized pages
        # stay compact, spill to disk under pressure, and evict cleanly.
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if cache_handles is not None:
        cache_handles.append(ranged)

    counts = dict(
        (r["__pid"], r["n"])
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("n")).collect()
    )
    total = 0
    boundary_pid = None
    remainder = 0
    keep_upto = -1  # all partitions <= keep_upto pass whole
    for pid in sorted(counts):
        if total + counts[pid] <= limit:
            total += counts[pid]
            keep_upto = pid
        else:
            boundary_pid = pid
            remainder = limit - total
            break

    whole = ranged.filter(F.col("__pid") <= keep_upto)
    if boundary_pid is None or remainder <= 0:
        return whole.drop("__pid")
    boundary = (
        ranged.filter(F.col("__pid") == boundary_pid)
        .orderBy(*[F.col(k).asc() for k in keys])
        .limit(remainder)
    )
    return whole.unionByName(boundary).drop("__pid")
