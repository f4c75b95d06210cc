"""Streaming-incremental crawl state: discovery merge + stateful gate.

The batch rounds in ``plans/rounds.py`` stay the parity path (the
reference is a batch loop); this module runs the same W4/R1-R5
semantics incrementally with Structured Streaming, for deployments
where discovered URLs arrive continuously instead of per-round:

- ``run_discovery_merge_stream`` — W4 as a ``foreachBatch`` upsert:
  each micro-batch of raw outlinks is canonicalized, hashed,
  batch-deduped (min depth per canonical URL), anti-joined against the
  accumulated frontier on the string-confirmed ``(url_hash, url)`` key,
  and appended. The checkpoint makes ingestion exactly-once per file;
  re-running with no new files is a no-op.
- ``politeness_gate_stream`` — R1-R5 as a custom stateful operator via
  ``applyInPandasWithState``: per-host admitted-count state persists
  ACROSS micro-batches, so a host's cumulative admissions never exceed
  its budget no matter how the stream is chopped. Arrow-batched like
  every other Python stage (no per-row UDFs).

Scale notes: the anti-join is an equi-join on (url_hash, url); the
stateful gate shuffles by host exactly once and its state row is one
long per host. Both run identically under ``availableNow`` (bounded
catch-up) and continuous triggers.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.urls import canonicalize_url, url_hash

__all__ = [
    "DISCOVERY_SCHEMA",
    "run_discovery_merge_stream",
    "politeness_gate_stream",
]

DISCOVERY_SCHEMA = StructType(
    [
        StructField("raw_link", StringType(), True),
        StructField("parent_depth", IntegerType(), True),
    ]
)


def _glob(path: str) -> str:
    return path if any(c in path for c in "*?[") else path + "/*"


def run_discovery_merge_stream(
    spark: SparkSession,
    discoveries_dir: str,
    frontier_dir: str,
    checkpoint_dir: str,
) -> None:
    """Incremental W4: stream raw outlink files into the frontier table.

    ``frontier_dir`` is an append-only parquet table of
    (url, url_hash, depth, first_seen_batch). Each micro-batch:

    1. canonicalize + drop nulls (try_parse semantics — one bad outlink
       must not kill the stream);
    2. min-depth dedup WITHIN the batch (several parents can discover
       the same URL in one batch);
    3. left-anti join against the current frontier on (url_hash, url) —
       hash-collision-safe, same key the batch engine uses;
    4. append only the genuinely-new rows.

    foreachBatch is the documented Structured Streaming pattern for
    upserts into engines without streaming MERGE; with Iceberg jars the
    body becomes a single ``MERGE INTO``. Blocks until availableNow
    drains (exactly-once per input file via the checkpoint).
    """

    def merge(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        canon = (
            batch.withColumn("url", canonicalize_url(F.col("raw_link")))
            .filter(F.col("url").isNotNull())
            .groupBy("url")
            .agg(F.min(F.col("parent_depth") + 1).alias("depth"))
            .select(
                "url",
                url_hash(F.col("url")).alias("url_hash"),
                "depth",
                F.lit(batch_id).alias("first_seen_batch"),
            )
        )
        if os.path.exists(frontier_dir):
            existing = s.read.parquet(frontier_dir).select("url_hash", "url")
            canon = canon.join(existing, ["url_hash", "url"], "left_anti")
        canon.write.mode("append").parquet(frontier_dir)

    (
        spark.readStream.schema(DISCOVERY_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(_glob(discoveries_dir))
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


_GATE_OUTPUT = StructType(
    [
        StructField("host", StringType(), False),
        StructField("url", StringType(), False),
        StructField("admit_seq", LongType(), False),
    ]
)
_GATE_STATE = StructType([StructField("admitted", LongType(), False)])


def politeness_gate_stream(
    candidates: DataFrame, host_budget: int
) -> DataFrame:
    """Custom stateful streaming operator: per-host admission budget.

    Input: streaming (host, url, seed_rank) candidates. Output: the
    admitted rows with their per-host admission sequence number. The
    per-host ``admitted`` count lives in Spark's state store and
    persists across micro-batches — chop the stream anywhere and a
    host still never exceeds ``host_budget`` cumulative admissions
    (the streaming twin of R1-R5's set-wise budget; batch rounds use
    the window in ``operators/politeness.py``).

    Within a batch, candidates admit in (seed_rank, url) priority order
    — deterministic for the tests and mirroring the batch priority key.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def gate(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        (admitted,) = state.get if state.exists else (0,)
        rows: list[dict[str, Any]] = []
        # a group's micro-batch may arrive as SEVERAL Arrow chunks —
        # concatenate before sorting, or an early low-priority chunk
        # could consume budget ahead of a later high-priority one
        chunks = list(pdfs)
        batch = (
            pd.concat(chunks, ignore_index=True)
            if chunks
            else pd.DataFrame(columns=["seed_rank", "url"])
        )
        batch = batch.sort_values(["seed_rank", "url"], kind="mergesort")
        for url in batch["url"]:
            if admitted >= host_budget:
                break
            admitted += 1
            rows.append({"host": host, "url": url, "admit_seq": admitted})
        state.update((admitted,))
        yield pd.DataFrame(rows, columns=["host", "url", "admit_seq"])

    return candidates.groupBy("host").applyInPandasWithState(
        gate,
        outputStructType=_GATE_OUTPUT,
        stateStructType=_GATE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
