"""Partitioned cuckoo filter (operators/cuckoo.py): exact-set parity
for membership after insert + delete, overflow accounting, FP bound,
and the sharded co-group Spark contract."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from web_scraper_spark.operators.cuckoo import (
    build_cuckoo_table,
    cuckoo_delete,
    cuckoo_might_contain,
    cuckoo_params,
)


def test_insert_probe_delete_exact_parity(spark):
    keys = spark.range(0, 4000).select(
        F.xxhash64(F.col("id")).alias("url_hash")
    )
    table = build_cuckoo_table(keys, n_shards=8, expected_per_shard=1024)
    rows = table.collect()
    assert len(rows) == 8
    assert sum(r.n_overflow for r in rows) == 0
    assert sum(r.n_items for r in rows) == 4000
    # no false negatives
    probe = cuckoo_might_contain(keys, table)
    assert probe.filter(~F.col("maybe_member")).count() == 0
    # delete every 4th key, then: kept keys still all present,
    # n_items drops by exactly the deleted count
    dels = spark.range(0, 1000).select(
        F.xxhash64(F.col("id") * 4).alias("url_hash")
    )
    table2 = cuckoo_delete(table, dels)
    assert sum(r.n_items for r in table2.collect()) == 3000
    kept = spark.range(0, 4000).filter(F.col("id") % 4 != 0).select(
        F.xxhash64(F.col("id")).alias("url_hash")
    )
    probe2 = cuckoo_might_contain(kept, table2)
    assert probe2.filter(~F.col("maybe_member")).count() == 0


def test_false_positive_rate_bounded(spark):
    keys = spark.range(0, 4000).select(
        F.xxhash64(F.col("id")).alias("url_hash")
    )
    table = build_cuckoo_table(keys, n_shards=8, expected_per_shard=1024)
    # disjoint probes (odd keys)
    odd = spark.range(0, 20000).select(
        F.xxhash64(F.col("id") * 2 + 1, F.lit("salt")).alias("url_hash")
    )
    fp = cuckoo_might_contain(odd, table).filter(F.col("maybe_member")).count()
    assert fp / 20000 < 0.005  # 16-bit fp, 2x4 slots -> ~0.02% expected


def test_overflow_is_counted_not_silent(spark):
    # 4000 keys into one shard sized for ~64 items: must overflow and
    # SAY so rather than silently dropping
    keys = spark.range(0, 4000).select(F.col("id").alias("url_hash"))
    table = build_cuckoo_table(keys, n_shards=1, expected_per_shard=64)
    r = table.collect()[0]
    assert r.n_overflow > 0
    assert r.n_items + r.n_overflow == 4000


def test_delete_nonmember_is_noop(spark):
    keys = spark.range(0, 1000).select(
        F.xxhash64(F.col("id")).alias("url_hash")
    )
    table = build_cuckoo_table(keys, n_shards=4, expected_per_shard=512)
    ghosts = spark.range(0, 500).select(
        F.xxhash64(F.col("id") * 2 + 1, F.lit("salt")).alias("url_hash")
    )
    table2 = cuckoo_delete(table, ghosts)
    # fp-aliased ghost deletions are possible in principle but must be
    # rare; the overwhelming majority of items survive intact
    assert sum(r.n_items for r in table2.collect()) >= 998
    probe = cuckoo_might_contain(keys, table2)
    assert probe.filter(~F.col("maybe_member")).count() <= 2


def test_params_power_of_two():
    for n in (10, 100, 5000, 123456):
        b = cuckoo_params(n)
        assert b & (b - 1) == 0
        assert b * 4 * 0.95 >= n


def test_stage_shapes_no_wide_shuffle(spark):
    keys = spark.range(0, 2000).select(
        F.xxhash64(F.col("id")).alias("url_hash")
    )
    table = build_cuckoo_table(keys, n_shards=8, expected_per_shard=512)
    out = cuckoo_might_contain(keys, table)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the two co-group exchanges (keys, filters) plus the unmaterialized
    # build's own groupBy shuffle; in the engine the state table is read
    # from disk, leaving only the narrow key exchanges
    assert plan.count("Exchange hashpartitioning") <= 3
    assert np.array(
        [r.maybe_member for r in out.collect()]
    ).all()
