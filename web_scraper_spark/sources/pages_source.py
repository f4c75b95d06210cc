"""The ``pages`` input table (input_hint shape) + fixture materialization.

``pages(url string, warc_ts timestamp, html binary, text string,
lang string)`` — Common-Crawl-style. The in-sandbox "fetch" is a lookup
join against this table keyed by canonical URL; on a live crawl the same
stage is an Arrow-batched HTTP client inside ``mapInPandas`` (one client
per Python worker, mirroring the reference's session reuse at
mmk_tracker.py:104-110) — identical dataflow, different row source.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.urls import canonicalize_url, url_hash
from .fixtures import World

__all__ = ["write_world_parquet", "load_pages", "resolve_pages"]


def write_world_parquet(world: World, out_dir: str) -> dict[str, str]:
    """Materialize the synthetic world with pyarrow (no Spark needed):
    pages / seeds / robots / tasks parquet files under ``out_dir``."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}

    pages_tbl = pa.table(
        {
            "url": [p["url"] for p in world.pages],
            "warc_ts": pa.array([p["warc_ts"] for p in world.pages], pa.timestamp("us")),
            "html": pa.array([p["html"] for p in world.pages], pa.binary()),
            "text": [p["text"] for p in world.pages],
            "lang": [p["lang"] for p in world.pages],
        }
    )
    paths["pages"] = os.path.join(out_dir, "pages.parquet")
    pq.write_table(pages_tbl, paths["pages"])

    seeds_tbl = pa.table(
        {
            "competitor_name": [s["competitor_name"] for s in world.seeds],
            "host": [s["host"] for s in world.seeds],
            "yacht_ids": pa.array(
                [list(s["yacht_ids"].items()) for s in world.seeds],
                pa.map_(pa.string(), pa.string()),
            ),
            "params": pa.array(
                [list(s["params"].items()) for s in world.seeds],
                pa.map_(pa.string(), pa.string()),
            ),
            "seed_rank": [s["seed_rank"] for s in world.seeds],
        }
    )
    paths["seeds"] = os.path.join(out_dir, "seeds.parquet")
    pq.write_table(seeds_tbl, paths["seeds"])

    robots_tbl = pa.table(
        {
            "host": [r["host"] for r in world.robots],
            "disallow": pa.array([r["disallow"] for r in world.robots], pa.list_(pa.string())),
            "crawl_delay_s": [r["crawl_delay_s"] for r in world.robots],
        }
    )
    paths["robots"] = os.path.join(out_dir, "robots.parquet")
    pq.write_table(robots_tbl, paths["robots"])

    tasks_tbl = pa.table(
        {k: [t[k] for t in world.tasks] for k in world.tasks[0].keys()}
    )
    paths["tasks"] = os.path.join(out_dir, "tasks.parquet")
    pq.write_table(tasks_tbl, paths["tasks"])
    return paths


def load_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def resolve_pages(pages: DataFrame, assume_unique: bool = False) -> DataFrame:
    """Canonical-url-keyed page lookup table (ingest-time op — run once
    when a page snapshot lands, never per round).

    Adds ``url_canon``/``url_hash`` and keeps the LATEST ``warc_ts`` row
    per canonical URL (J5 latest-row semantics,
    booking_data_repository.py:66-82's ``sort last_update_date desc,
    take 1``) — Common Crawl re-crawls the same URL across snapshots.

    ``assume_unique=True`` skips the dedup window entirely (a pure
    projection, html never shuffles) — for inputs already unique per
    canonical URL, e.g. an earlier resolve output or a generator that
    emits each URL once. The dedup window shuffles the wide ``html``
    column; at scale prefer resolving each incoming snapshot delta and
    merging winners by key, not re-windowing the full corpus.
    """
    marker = b"<!--STATUS:500-->"
    canon = (
        pages.withColumn("url_canon", canonicalize_url(F.col("url")))
        .filter(F.col("url_canon").isNotNull())
    )
    if not assume_unique:
        w = Window.partitionBy("url_canon").orderBy(
            F.col("warc_ts").desc(), F.col("url").desc()
        )
        canon = (
            canon.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    return (
        canon.withColumn("url_hash", url_hash(F.col("url_canon")))
        # page_status computed here so the round's outcome split can
        # join a NARROW projection (no html) — the wide binary column
        # is only read for rows that reach extraction
        .withColumn(
            "page_status",
            F.when(
                F.substring(F.col("html"), 1, len(marker)) == F.lit(marker), "error"
            ).otherwise("ok"),
        )
    )
