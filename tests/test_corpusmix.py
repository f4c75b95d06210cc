"""Source-level curation: domain quality gate + temperature mixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_scraper_spark.operators.corpusmix import (
    mixture_rates,
    mixture_sample,
    source_quality_gate,
    source_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING, source STRING")


def test_gate_drops_whole_source_including_clean_docs(spark):
    rows = [(i, "clean alpha words here we go", "good") for i in range(4)]
    # 'spamco' has one clean doc drowned by junk mass: corpus alpha < 0.5
    rows += [(10, "clean alpha words here we go", "spamco")]
    rows += [(11 + i, "0 1 2 3 4 5 6 7 8 9 " * 20, "spamco") for i in range(3)]
    kept = source_quality_gate(_docs(spark, rows), min_alpha=0.5)
    got = sorted(r["doc_id"] for r in kept.collect())
    assert got == [0, 1, 2, 3]  # spamco's clean doc 10 dies with its domain


def test_gate_min_docs(spark):
    rows = [(0, "alpha words", "solo"), (1, "alpha words", "duo"), (2, "more words", "duo")]
    kept = source_quality_gate(_docs(spark, rows), min_alpha=0.1, min_docs=2)
    assert sorted(r["source"] for r in kept.collect()) == ["duo", "duo"]


def test_mixture_rates_shape(spark):
    stats = spark.createDataFrame(
        [("big", 1000), ("mid", 100), ("small", 10)],
        "source STRING, total_tokens BIGINT",
    )
    r = {x["source"]: x["rate"] for x in mixture_rates(stats, 0.7).collect()}
    assert r["small"] == 1.0  # smallest source never sampled down
    assert r["small"] > r["mid"] > r["big"]  # bigger -> harder down-sample
    assert abs(r["mid"] - (100 / 10) ** (-0.3)) < 1e-3


def test_mixture_sample_deterministic_and_rate_shaped(spark):
    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.lit("w " * 10).alias("text"),
        F.when(F.col("id") % 10 < 9, "big").otherwise("small").alias("source"),
    )
    rates = spark.createDataFrame(
        [("big", 0.25), ("small", 1.0)], "source STRING, rate DOUBLE"
    )
    a = mixture_sample(docs, rates).groupBy("source").count().collect()
    b = mixture_sample(docs, rates).groupBy("source").count().collect()
    got = {r["source"]: r["count"] for r in a}
    assert got == {r["source"]: r["count"] for r in b}  # pure function of ids
    assert got["small"] == 200  # rate 1 keeps everything
    assert 350 < got["big"] < 550  # ~25% of 1800


def test_sampled_token_mass_follows_temperature(spark):
    # two sources, 10x token imbalance; tau=0.5 should pull the
    # post-sample ratio from 10:1 toward sqrt(10):1
    docs = spark.range(1100).select(
        F.col("id").alias("doc_id"),
        F.lit("t " * 8).alias("text"),
        F.when(F.col("id") < 1000, "big").otherwise("small").alias("source"),
    )
    rates = mixture_rates(source_stats(docs), temperature=0.5)
    samp = mixture_sample(docs, rates).groupBy("source").count().collect()
    got = {r["source"]: r["count"] for r in samp}
    ratio = got["big"] / max(got["small"], 1)
    assert 2.0 < ratio < 5.0  # sqrt(10) ~ 3.16, hash noise allowed
