"""SURT keys + CDX range-ordered index (operators/cdx.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_scraper_spark.operators.cdx import build_cdx, surt_key


def test_surt_key_forms(spark):
    rows = spark.createDataFrame(
        [
            ("https://www.News.Example.co.uk/A/B?b=2&a=1",),
            ("http://example.com",),
            ("https://example.com/x?",),
            ("not a url",),
        ],
        "url string",
    ).select("url", surt_key(F.col("url")).alias("surt"))
    got = {r.url: r.surt for r in rows.collect()}
    assert got["https://www.News.Example.co.uk/A/B?b=2&a=1"] == (
        "uk,co,example,news)/a/b?a=1&b=2"
    )
    # empty path -> "/", empty query dropped
    assert got["http://example.com"] == "com,example)/"
    assert got["https://example.com/x?"] == "com,example)/x"
    assert got["not a url"] is None


def test_build_cdx_range_disjoint_shards(spark):
    rows = [
        (f"https://h{i % 7}.example.com/p/{i}", f"2025-01-{(i % 27) + 1:02d}")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts string")
    cdx = build_cdx(df, n_shards=4)
    # shards cover disjoint surt ranges and rows are sorted within
    parts = (
        cdx.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            F.min("surt").alias("lo"),
            F.max("surt").alias("hi"),
            F.count("*").alias("n"),
        )
        .orderBy("pid")
        .collect()
    )
    nonempty = [p for p in parts if p.n > 0]
    for a, b in zip(nonempty, nonempty[1:]):
        assert a.hi <= b.lo
    # within-partition order == (surt, ts) sorted
    local = cdx.select("surt", "warc_ts").collect()  # partition-ordered
    chunks = cdx.rdd.glom().map(
        lambda it: [(r["surt"], r["warc_ts"]) for r in it]
    ).collect()
    for ch in chunks:
        assert ch == sorted(ch)
    assert sum(len(c) for c in chunks) == 200 == len(local)


def test_surt_no_python_udf(spark):
    df = spark.createDataFrame([("https://a.example.com/1",)], "url string")
    plan = (
        df.select(surt_key(F.col("url")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
