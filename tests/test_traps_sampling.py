"""Crawler-trap detection, deterministic sampling, sequence packing."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from web_scraper_spark.operators.sampling import hash_sample, pack_sequences
from web_scraper_spark.operators.traps import trap_signals, url_template


def test_url_template_collapses_runs(spark):
    df = spark.range(1).select(
        url_template(F.lit("/cal/2026/08/17/x9")).alias("a"),
        url_template(F.lit("/s/deadbeefcafe1234/p/7")).alias("b"),
    )
    r = df.first()
    assert r["a"] == "/cal/N/N/N/xN"
    assert r["b"] == "/s/H/p/N"


def test_trap_signals_flags_manufactured_urls(spark):
    rows = [("trap.com", f"/cal/{i}/d{i % 7}") for i in range(600)]
    rows += [("ok.com", f"/page/{i % 12}") for i in range(600)]
    df = spark.createDataFrame(rows, "host string, path string")
    out = {r["host"]: r for r in trap_signals(df).collect()}
    t, o = out["trap.com"], out["ok.com"]
    assert t["n_templates"] == 1 and t["n_paths"] == 600 and t["trap"]
    assert o["n_templates"] == 1 and o["n_paths"] == 12 and not o["trap"]
    assert t["max_template_paths"] == 600


def test_hash_sample_deterministic_and_stratified(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "tr") for i in range(4000)],
        "doc_id long, lang string",
    )
    frac = {"en": 0.25, "tr": 0.75}
    a = {r["doc_id"] for r in hash_sample(docs, frac).collect()}
    b = {r["doc_id"] for r in hash_sample(docs, frac).collect()}
    assert a == b  # pure function of (salt, id)
    n_en = sum(1 for i in a if i % 2 == 0)
    n_tr = len(a) - n_en
    assert abs(n_en / 2000 - 0.25) < 0.05
    assert abs(n_tr / 2000 - 0.75) < 0.05
    # monotone thresholds: a lower rate selects a subset
    small = {
        r["doc_id"]
        for r in hash_sample(docs, {"en": 0.1, "tr": 0.3}).collect()
    }
    assert small <= a
    # different salt -> different (still deterministic) selection
    c = {r["doc_id"] for r in hash_sample(docs, frac, salt="x").collect()}
    assert c != a


def test_pack_sequences_exact_accounting(spark):
    docs = spark.createDataFrame(
        [(i, (i * 37) % 700) for i in range(500)], "doc_id long, n_tokens long"
    )
    out = pack_sequences(docs, max_tokens=512, n_shards=8).collect()
    by_shard = defaultdict(list)
    for r in out:
        by_shard[r["shard"]].append(r)
    assert len(out) == 500
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["doc_id"])
        offset = 0
        for r in rows:
            # contiguous layout: doc + 1 separator token, no gaps
            assert r["start_offset"] == offset
            assert r["window_first"] == offset // 512
            last_tok = max(offset + r["n_tokens"] - 1, offset)
            assert r["window_last"] == last_tok // 512
            assert r["window_last"] >= r["window_first"]
            offset += r["n_tokens"] + 1


def test_pack_sequences_straddles_windows(spark):
    docs = spark.createDataFrame(
        [(1, 400), (2, 400), (3, 10)], "doc_id long, n_tokens long"
    )
    out = {
        r["doc_id"]: r
        for r in pack_sequences(docs, max_tokens=512, n_shards=1).collect()
    }
    # doc2 starts at 401 and ends at 800: crosses the 512 boundary
    assert out[2]["window_first"] == 0 and out[2]["window_last"] == 1
    assert out[3]["window_first"] == out[3]["window_last"] == 1


def test_split_assign_no_domain_straddles_splits(spark):
    """Leakage invariant: every domain lands in exactly one split, the
    split set is exhaustive, and assignment is deterministic."""
    from pyspark.sql import functions as F

    from web_scraper_spark.operators.sampling import split_assign

    docs = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("d"), (F.col("id") % 97).cast("string")).alias("domain"),
    )
    out = split_assign(docs, by_col="domain")
    per_domain = out.groupBy("domain").agg(
        F.countDistinct("split").alias("k")
    )
    assert per_domain.filter("k > 1").count() == 0
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "valid", "test"} and "train" in splits
    # deterministic: re-running yields the identical assignment
    again = split_assign(docs, by_col="domain")
    assert (
        out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0
    )


def test_split_assign_fraction_validation(spark):
    import pytest
    from pyspark.sql import functions as F

    from web_scraper_spark.operators.sampling import split_assign

    docs = spark.range(10).select(
        F.col("id").cast("string").alias("domain")
    )
    with pytest.raises(ValueError):
        split_assign(docs, splits=[("a", 0.5), ("b", 0.2)])
