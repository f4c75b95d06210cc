"""SparkSession factory with scale-oriented defaults.

Designed for a 1000-executor cluster reading ~100 TB, tested on
``local[N]``: AQE on (runtime re-plan + skew-join splitting), Arrow
enabled for the few vectorized-UDF stages, shuffle partitions sized by
cores (overridable per deployment), dynamic partition overwrite for the
idempotent round commits.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]


def get_spark(
    app_name: str = "web_scraper_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to the core count — on a real cluster
    this is set to 2-3x total cores (or left to AQE coalescing).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- AQE: runtime plan fixes (partition coalescing, skew splits) ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # deterministic time semantics (matches DuckDB's naive-UTC reads)
        .config("spark.sql.session.timeZone", "UTC")
        # --- shuffle sizing ---
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # 128 MiB input splits: good default for parquet scans at scale.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # --- Arrow for the pandas-UDF stages (extraction); batched, not per-row ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- idempotent round commits: overwrite only the partitions present ---
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # --- broadcast small dims (robots, seeds, politeness params) ---
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # quieter local runs
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
