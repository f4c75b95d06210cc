"""Sketch operators: HyperLogLog cardinality, Count-Min frequency,
HITS centrality, BM25 retrieval — accuracy bounds, the mergeability
properties that justify them at scale, and analytic ground truths."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from web_scraper_spark.operators.linkgraph import hits
from web_scraper_spark.operators.postings import bm25_topk
from web_scraper_spark.operators.sketches import (
    cms_estimate,
    cms_sketch,
    hll_distinct,
    hll_estimate,
    hll_registers,
)


@pytest.fixture(scope="module")
def elems(spark):
    # 3000 distinct elements in one group, 40 in the other
    return spark.range(0, 9000).select(
        F.when(F.col("id") < 6000, F.lit(0)).otherwise(1).alias("grp"),
        F.when(F.col("id") < 6000, F.col("id") % 3000)
        .otherwise(F.col("id") % 40)
        .cast("string")
        .alias("elem"),
    )


def test_hll_within_expected_error(spark, elems):
    rows = {
        r["grp"]: r["hll_estimate"]
        for r in hll_distinct(elems, "elem", ["grp"], p=8).collect()
    }
    # p=8 -> typical rel. error 1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(rows[0] - 3000) / 3000 < 0.20
    assert abs(rows[1] - 40) / 40 < 0.20


def test_hll_small_range_uses_linear_counting(spark):
    df = spark.range(0, 5).select(
        F.lit(0).alias("grp"), F.col("id").cast("string").alias("elem")
    )
    est = hll_distinct(df, "elem", ["grp"], p=8).collect()[0]["hll_estimate"]
    # 5 distinct -> 5 registers hit, 251 zeros: m * ln(m/zeros)
    expected = round(256.0 * math.log(256.0 / 251.0), 4)
    assert est == pytest.approx(expected, abs=1e-4)


def test_hll_registers_merge_by_max(spark, elems):
    """The 100 TB contract: per-partition sketches combine by register
    max — registers(A ∪ B) == max-merge(registers(A), registers(B))."""
    a = elems.filter(F.col("elem").cast("long") % 2 == 0)
    b = elems.filter(F.col("elem").cast("long") % 2 != 0)
    whole = hll_registers(elems, "elem", ["grp"])
    merged = (
        hll_registers(a, "elem", ["grp"])
        .unionByName(hll_registers(b, "elem", ["grp"]))
        .groupBy("grp", "idx")
        .agg(F.max("rho").alias("rho"))
    )
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0
    # and therefore the estimates agree exactly
    e1 = hll_estimate(whole, ["grp"]).collect()
    e2 = hll_estimate(merged, ["grp"]).collect()
    assert sorted(map(tuple, e1)) == sorted(map(tuple, e2))


def test_cms_never_underestimates(spark):
    # value k in 0..49 appears k+1 times
    df = spark.range(0, 50).select(
        F.explode(F.sequence(F.lit(0), F.col("id"))).alias("_"),
        F.col("id").cast("string").alias("elem"),
    )
    sketch = cms_sketch(df, "elem", depth=4, width=64)
    est = cms_estimate(sketch, df.select("elem").distinct(), "elem")
    exact = df.groupBy("elem").agg(F.count(F.lit(1)).alias("n"))
    joined = est.join(exact, "elem").collect()
    assert len(joined) == 50
    for r in joined:
        assert r["cms_count"] >= r["n"]  # CMS one-sided error
    # with 1275 items in 4x64 cells, the top element is estimated
    # closely (collisions add at most a few small counts)
    top = max(joined, key=lambda r: r["n"])
    assert top["n"] == 50
    assert top["cms_count"] - top["n"] <= 200


def test_cms_sketch_is_mergeable(spark):
    df = spark.range(0, 2000).select(
        (F.col("id") % 97).cast("string").alias("elem"), F.col("id")
    )
    a, b = df.filter("id < 1000"), df.filter("id >= 1000")
    whole = cms_sketch(df, "elem")
    merged = (
        cms_sketch(a, "elem")
        .unionByName(cms_sketch(b, "elem"))
        .groupBy("row", "col")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0


def test_hits_star_graph_analytic(spark):
    """One hub h linking to authorities a1..a3 with equal weight:
    authorities converge to 1/sqrt(3) each, hub to 1, analytically —
    in ONE iteration (the iteration is a fixed point here)."""
    edges = spark.createDataFrame(
        [("h", "a1", 1.0), ("h", "a2", 1.0), ("h", "a3", 1.0)],
        ["src", "dst", "weight"],
    )
    rows = {r["node"]: r for r in hits(edges, n_iter=2, round_to=6).collect()}
    inv_sqrt3 = round(1.0 / math.sqrt(3.0), 6)
    for a in ("a1", "a2", "a3"):
        assert rows[a]["authority"] == pytest.approx(inv_sqrt3, abs=1e-6)
        assert rows[a]["hub"] == 0.0
    assert rows["h"]["hub"] == pytest.approx(1.0, abs=1e-6)
    assert rows["h"]["authority"] == 0.0


def test_hits_weight_sensitivity(spark):
    """A page linked 3x outranks a page linked 1x in authority."""
    edges = spark.createDataFrame(
        [("h1", "a1", 3.0), ("h1", "a2", 1.0), ("h2", "a1", 2.0)],
        ["src", "dst", "weight"],
    )
    rows = {r["node"]: r for r in hits(edges, n_iter=3, round_to=6).collect()}
    assert rows["a1"]["authority"] > rows["a2"]["authority"]
    assert rows["h1"]["hub"] > rows["h2"]["hub"]  # h1 carries more weight


def test_bm25_ranks_relevance(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark shuffle join join join"),
            (2, "spark join"),
            (3, "nothing relevant here at all whatsoever truly"),
            (4, "join " * 50),  # long doc: length-normalized down
        ],
        ["doc_id", "text"],
    )
    rows = bm25_topk(docs, ["join"], top_k=10).collect()
    got = {r["doc"]: r["score"] for r in rows}
    assert 3 not in got  # no query term -> no score row
    # doc 1 (3 hits, short) beats doc 2 (1 hit); saturation + length
    # normalization keep doc 4's 50 hits from dominating linearly
    assert got[1] > got[2]
    assert got[4] < 3 * got[1]


def test_bm25_deterministic_topk_order(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta") for i in range(30)], ["doc_id", "text"]
    )
    rows = bm25_topk(docs, ["alpha"], top_k=5).collect()
    # all scores tie -> the (score desc, doc asc) tiebreak must pick
    # the 5 smallest doc ids, in order
    assert [r["doc"] for r in rows] == [0, 1, 2, 3, 4]
