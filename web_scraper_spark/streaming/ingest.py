"""Streaming ingest of the pages table (optional extension — SURVEY.md
§2.9: the reference is a batch loop; rounds stay batch for parity, and
this module shows the same plan running incrementally).

``readStream`` over the pages parquet directory with
``trigger(availableNow=True)`` processes exactly the files present and
stops — the batch-equivalent execution mode — while checkpointing file
progress so the next invocation picks up only new page dumps
(incremental Common-Crawl snapshot ingestion). Late/duplicate page
captures are handled by a watermark + canonical-url dedup before the
windowed per-host fetch-rate aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import canonicalize_url

__all__ = ["stream_pages", "hostrate_stream", "run_available_now"]


def stream_pages(spark: SparkSession, pages_dir: str, schema) -> DataFrame:
    """File-stream over page-dump batches dropped as subdirectories of
    ``pages_dir``. The file source does not recurse, so glob one level
    (``dir/*``) unless the caller already passed a glob."""
    path = pages_dir if any(c in pages_dir for c in "*?[") else pages_dir + "/*"
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(path)
    )


def hostrate_stream(pages: DataFrame) -> DataFrame:
    """Per-host page-capture rate in 1-hour event-time windows, with a
    2-hour watermark for late captures and canonical-url dedup within
    the watermark horizon."""
    canon = (
        pages.withColumn("url_canon", canonicalize_url(F.col("url")))
        .filter(F.col("url_canon").isNotNull())
        .withColumn("host", F.lower(F.try_parse_url(F.col("url"), F.lit("HOST"))))
        # watermarks need TIMESTAMP (NTZ unsupported); session tz is UTC
        .withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
        .withWatermark("warc_ts", "2 hours")
        .dropDuplicates(["url_canon"])
    )
    return canon.groupBy(
        F.window("warc_ts", "1 hour").alias("w"), "host"
    ).agg(
        F.count("*").alias("n_pages"),
        F.sum(F.octet_length("html")).alias("bytes"),
    ).select(
        F.col("w.start").alias("window_start"),
        "host",
        "n_pages",
        "bytes",
    )


def run_available_now(
    result: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Process everything currently available, then stop (batch-
    equivalent trigger); file-source progress is checkpointed so a
    re-run ingests only new files."""
    q = (
        result.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
