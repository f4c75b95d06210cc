"""Connected-components clustering over duplicate-pair graphs.

Pins the transitive-closure semantics that pairwise dropping gets
wrong: in a chain a-b-c, exactly two docs must be dropped (one
representative survives), not all of b and c independently.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from web_scraper_spark.operators.components import (
    connected_components,
    dedup_keep_representatives,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src BIGINT, dst BIGINT")


def _labels(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_chain_collapses_to_min(spark):
    # a-b, b-c, plus an isolated pair (10,11)
    comp = connected_components(_edges(spark, [(1, 2), (2, 3), (10, 11)]))
    assert _labels(comp) == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_direction_and_duplicates_ignored(spark):
    # reversed / duplicate edges give the same clustering
    comp = connected_components(
        _edges(spark, [(3, 2), (2, 3), (2, 1), (1, 2), (1, 2)])
    )
    assert _labels(comp) == {1: 1, 2: 1, 3: 1}


def test_long_chain_converges(spark):
    # path 0-1-2-...-9: worst case for min-label (diameter rounds)
    comp = connected_components(_edges(spark, [(i, i + 1) for i in range(9)]))
    assert set(_labels(comp).values()) == {0}


def test_two_cliques_stay_separate(spark):
    edges = [(a, b) for a in range(3) for b in range(3) if a < b]
    edges += [(a, b) for a in range(20, 24) for b in range(20, 24) if a < b]
    got = _labels(connected_components(_edges(spark, edges)))
    assert {n: c for n, c in got.items() if n < 10} == {0: 0, 1: 0, 2: 0}
    assert {n: c for n, c in got.items() if n >= 20} == {n: 20 for n in range(20, 24)}


def test_keep_representatives_no_overdelete(spark):
    # chain 1-2, 2-3: pairwise "drop right side" would kill 2 AND 3;
    # clustering must keep exactly one of {1,2,3}
    docs = spark.range(6).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("t"), "id").alias("text")
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a BIGINT, doc_b BIGINT")
    kept = dedup_keep_representatives(docs, pairs)
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1, 4, 5]
    assert kept.columns == docs.columns


def test_keep_representatives_empty_pairs(spark):
    docs = spark.range(4).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame([], "doc_a BIGINT, doc_b BIGINT")
    assert dedup_keep_representatives(docs, pairs).count() == 4
