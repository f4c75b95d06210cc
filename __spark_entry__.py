"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship crawl-scheduling pipeline on sf0.001.
``queries()`` / ``oracle_sql()`` — the operator battery from
web_scraper_spark.queries (one entry per implemented SURVEY.md §2
operator + the training-data pipeline extensions), with DuckDB oracle
SQL for every SQL-expressible op.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from web_scraper_spark.queries import battery, battery_mmk, battery_text  # noqa: E402,F401  (populates REGISTRY)
from web_scraper_spark.queries.battery import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one politeness-scheduled crawl selection over sf0.001.

    Synthesizes a URL frontier from the events table, canonicalizes +
    hashes, drops seen URLs (anti-join), applies per-host politeness
    budgets and the global ordered-limit, and returns the per-host
    selection metrics — the §3.1 round pipeline in miniature.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    sf_dir = "/root/testdata/sf0.001"

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from web_scraper_spark.functions.urls import canonicalize_url, url_hash

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cand = ev.select(
        "event_id",
        "ts",
        (F.col("user_id") % 20).alias("host_id"),
        canonicalize_url(
            F.concat(
                F.lit("HTTPS://Host"),
                (F.col("user_id") % 20).cast("string"),
                F.lit(".Example.COM:443/e/"),
                F.col("event_id").cast("string"),
                F.lit("?b=2&a=1#frag"),
            )
        ).alias("url"),
    ).withColumn("url_hash", url_hash(F.col("url")))

    seen = cand.filter(F.col("event_id") % 5 == 0).select("url_hash")
    unseen = cand.join(seen, "url_hash", "left_anti")

    w = Window.partitionBy("host_id").orderBy("ts", "event_id")
    selected = (
        unseen.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 25)
        .orderBy("ts", "event_id")
        .limit(300)
    )
    return (
        selected.groupBy("host_id")
        .agg(
            F.count("*").alias("n_selected"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
        .orderBy("host_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def with_utc(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # time-typed results (epoch millis, hour windows, strftime)
            # are defined against UTC — the DuckDB oracle reads naive
            # parquet timestamps as UTC, so the Spark session must too
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        return wrapped

    return {name: with_utc(fn) for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
