"""Distributed global top-G ≡ orderBy().limit(G)."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_scraper_spark.operators.limits import global_priority_limit


def _df(spark, n=10_000):
    return spark.range(n).select(
        (F.xxhash64("id") % 100).alias("k1"),
        F.col("id").alias("k2"),
        F.concat(F.lit("p"), F.col("id")).alias("payload"),
    )


def test_equals_ordered_limit(spark):
    df = _df(spark)
    keys = ["k1", "k2"]
    for g in (0, 1, 137, 5000, 9999, 10_000, 20_000):
        handles: list = []
        got = sorted(
            tuple(r)
            for r in global_priority_limit(df, keys, g, cache_handles=handles).collect()
        )
        want = sorted(tuple(r) for r in df.orderBy(*keys).limit(g).collect())
        assert got == want, f"limit={g}: {len(got)} vs {len(want)}"
        for h in handles:
            h.unpersist()


def test_empty_input(spark):
    df = _df(spark, 0)
    assert global_priority_limit(df, ["k1", "k2"], 10).count() == 0
