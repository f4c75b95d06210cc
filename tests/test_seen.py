"""Seen-filter: bloom-prefiltered path ≡ plain left-anti join (S6/J1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_scraper_spark.operators.seen import build_seen_bloom, filter_unseen


def test_two_phase_equals_anti_join(spark):
    candidates = spark.range(5000).select(
        F.xxhash64("id").alias("url_hash"), F.concat(F.lit("u"), "id").alias("url")
    )
    seen = spark.range(0, 5000, 3).select(F.xxhash64("id").alias("url_hash"))

    plain = candidates.join(seen, "url_hash", "left_anti")
    bloom = build_seen_bloom(seen, n_buckets=8, expected_items_per_bucket=1000)
    two_phase = filter_unseen(candidates, seen, bloom, n_buckets=8)

    a = {r.url for r in plain.collect()}
    b = {r.url for r in two_phase.collect()}
    assert a == b
    assert len(a) == 5000 - len(range(0, 5000, 3))


def test_no_bloom_fallback(spark):
    candidates = spark.range(100).select(F.xxhash64("id").alias("url_hash"))
    seen = spark.range(50).select(F.xxhash64("id").alias("url_hash"))
    out = filter_unseen(candidates, seen)
    assert out.count() == 50
