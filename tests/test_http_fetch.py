"""P12 — executor-lifetime HTTP client state: the client is constructed
once per Python worker process, not per row or per batch
(nausys_tracker.py:202-214 / mmk_tracker.py:104-110 session reuse)."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_scraper_spark.sources.http_fetch import http_fetch_stage, make_mock_client


def test_client_constructed_once_per_worker(spark):
    n_rows = 4000
    urls = spark.range(n_rows).select(
        F.concat(F.lit("https://h"), (F.col("id") % 40).cast("string"),
                 F.lit("/p/"), F.col("id").cast("string")).alias("url")
    ).repartition(8)

    out = http_fetch_stage(urls, make_mock_client).cache()
    rows = out.count()
    assert rows == n_rows

    stats = (
        out.groupBy("worker_pid")
        .agg(F.max("client_seq").alias("max_seq"), F.count("*").alias("n"))
        .collect()
    )
    out.unpersist()
    # every row was served by a client that was this worker's FIRST and
    # ONLY construction — n constructions == n worker processes
    assert all(r.max_seq == 1 for r in stats), stats
    # the work actually fanned out, and workers served many rows each
    # (init-per-row would imply constructions == rows)
    assert 1 <= len(stats) <= 64
    assert max(r.n for r in stats) > 10


def test_fetch_stage_output_shape(spark):
    urls = spark.createDataFrame([("https://h/x",)], "url string")
    row = http_fetch_stage(urls, make_mock_client).collect()[0]
    assert row.status == 200
    assert row.body == "payload:https://h/x"
