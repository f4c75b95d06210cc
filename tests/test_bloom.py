"""Partitioned Bloom filter: zero false negatives, bounded FPR."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from web_scraper_spark.operators.bloom import (
    _positions,
    _set_bits,
    _test_bits,
    bloom_might_contain,
    bloom_params,
    build_bloom_table,
)

N_BUCKETS = 8


def test_bloom_params_sane():
    m, k = bloom_params(10_000, 0.01)
    assert m >= 10_000 * 9  # ~9.6 bits/key at 1% fpp
    assert 1 <= k <= 16


def test_numpy_bloom_roundtrip():
    m, k = bloom_params(1000, 0.01)
    bits = np.zeros(m // 8, dtype=np.uint8)
    keys = np.arange(1000, dtype=np.int64) * 2654435761 % (2**63)
    _set_bits(bits, _positions(keys, m, k))
    assert _test_bits(bits, _positions(keys, m, k)).all()


def test_no_false_negatives_and_fpr(spark):
    seen = spark.range(20_000).select(F.xxhash64("id").alias("url_hash"))
    bloom = build_bloom_table(seen, N_BUCKETS, expected_items_per_bucket=20_000 // N_BUCKETS, fpp=0.01)

    # members: every member must be flagged
    members = seen
    flagged = bloom_might_contain(members, bloom, N_BUCKETS)
    assert flagged.filter(~F.col("might_be_seen")).count() == 0

    # non-members (disjoint id range): FPR within ~3x of target
    non = spark.range(100_000, 140_000).select(F.xxhash64("id").alias("url_hash"))
    fp = bloom_might_contain(non, bloom, N_BUCKETS).filter(F.col("might_be_seen")).count()
    assert fp / 40_000 < 0.03


def test_empty_bucket_means_unseen(spark):
    seen = spark.range(0).select(F.xxhash64("id").alias("url_hash"))
    bloom = build_bloom_table(seen, N_BUCKETS, 100)
    cand = spark.range(100).select(F.xxhash64("id").alias("url_hash"))
    out = bloom_might_contain(cand, bloom, N_BUCKETS)
    assert out.filter(F.col("might_be_seen")).count() == 0
    assert out.count() == 100


def test_merge_bloom_tables_preserves_membership(spark):
    """OR-merge of same-geometry filters: every item inserted into
    EITHER side is a member of the merged filter (zero false negatives
    across incremental rounds), and the FPR stays bounded."""
    from web_scraper_spark.operators.bloom import bloom_params as _params
    from web_scraper_spark.operators.bloom import merge_bloom_tables

    geom = _params(4_000, 0.01)
    old = spark.range(0, 10_000).select(F.xxhash64("id").alias("url_hash"))
    new = spark.range(10_000, 14_000).select(F.xxhash64("id").alias("url_hash"))
    b_old = build_bloom_table(old, N_BUCKETS, 1, params=geom)
    b_new = build_bloom_table(new, N_BUCKETS, 1, params=geom)
    merged = merge_bloom_tables(b_old, b_new).cache()

    both = old.unionByName(new)
    flagged = bloom_might_contain(both, merged, N_BUCKETS)
    assert flagged.filter(~F.col("might_be_seen")).count() == 0

    # n_items sums across the merge
    totals = merged.agg(F.sum("n_items").alias("n")).collect()[0].n
    assert totals == 14_000

    # non-members: FPR bounded (loose 5x of the 1% target)
    probe = spark.range(1_000_000, 1_020_000).select(
        F.xxhash64("id").alias("url_hash")
    )
    fp = (
        bloom_might_contain(probe, merged, N_BUCKETS)
        .filter(F.col("might_be_seen"))
        .count()
    )
    merged.unpersist()
    assert fp / 20_000 < 0.05
