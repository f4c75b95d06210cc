"""Unit tests for redirect resolution, canonical collapse, anchor-text
aggregation, postings, HTTP cache policy, and URL classification."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_scraper_spark.functions.http_headers import (
    cache_directives,
    cache_max_age_s,
)
from web_scraper_spark.functions.urls import classify_url
from web_scraper_spark.operators.anchors import top_anchor_texts
from web_scraper_spark.operators.postings import term_postings
from web_scraper_spark.operators.redirects import (
    collapse_canonical,
    resolve_redirects,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "url string, redirect_to string")


def test_redirect_chain_and_terminal(spark):
    rows = [
        ("a", "b"),
        ("b", "c"),
        ("c", None),          # 2-hop chain a->b->c
        ("x", "ghost"),       # redirect to a URL we never crawled
        ("solo", None),       # plain terminal page
    ]
    out = {
        r["url"]: r
        for r in resolve_redirects(_edges(spark, rows), max_hops=16).collect()
    }
    assert out["a"]["final_url"] == "c" and out["a"]["hops"] == 2
    assert out["b"]["final_url"] == "c" and out["b"]["hops"] == 1
    assert out["c"]["final_url"] == "c" and out["c"]["hops"] == 0
    # unknown target is treated as the chain terminal
    assert out["x"]["final_url"] == "ghost" and out["x"]["hops"] == 1
    assert out["solo"]["final_url"] == "solo" and out["solo"]["hops"] == 0
    assert not any(r["is_loop"] for r in out.values())


def test_redirect_cycle_flagged(spark):
    rows = [("a", "b"), ("b", "a"), ("in", "a"), ("t", None)]
    out = {
        r["url"]: r
        for r in resolve_redirects(_edges(spark, rows), max_hops=8).collect()
    }
    for u in ("a", "b", "in"):
        assert out[u]["is_loop"], u
        assert out[u]["final_url"] is None
        assert out[u]["hops"] is None
    assert not out["t"]["is_loop"]


def test_redirect_overlong_chain_flagged(spark):
    # 20-hop chain with max_hops=8: must be flagged, not resolved
    rows = [(f"u{i}", f"u{i + 1}") for i in range(20)] + [("u20", None)]
    out = {
        r["url"]: r
        for r in resolve_redirects(_edges(spark, rows), max_hops=8).collect()
    }
    assert out["u0"]["is_loop"]
    # a row within the cap still resolves
    assert out["u15"]["final_url"] == "u20" and out["u15"]["hops"] == 5


def test_redirect_hop_cap_exact_boundary(spark):
    # chain of exactly max_hops resolves; max_hops+1 does not
    rows = [(f"v{i}", f"v{i + 1}") for i in range(8)] + [("v8", None)]
    out = {
        r["url"]: r
        for r in resolve_redirects(_edges(spark, rows), max_hops=8).collect()
    }
    assert out["v0"]["final_url"] == "v8" and out["v0"]["hops"] == 8


def test_canonical_collapse_latest_wins(spark):
    rows = [
        ("p1", "c", "2024-01-01 00:00:00"),
        ("p2", "c", "2024-01-03 00:00:00"),  # latest in group -> kept
        ("c", None, "2024-01-02 00:00:00"),
        ("lone", None, "2024-01-01 00:00:00"),
        ("selfy", "selfy", "2024-01-01 00:00:00"),  # self-canonical == none
    ]
    df = spark.createDataFrame(
        rows, "url string, canonical_url string, warc_ts string"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    out = {r["canonical"]: r for r in collapse_canonical(df).collect()}
    assert out["c"]["kept_url"] == "p2" and out["c"]["n_collapsed"] == 3
    assert out["lone"]["n_collapsed"] == 1
    assert out["selfy"]["kept_url"] == "selfy" and out["selfy"]["n_collapsed"] == 1


def test_top_anchor_texts(spark):
    rows = (
        [("d1", " Home ")] * 3
        + [("d1", "home")] * 2  # merges with ' Home ' after trim+lower -> 5
        + [("d1", "start")] * 4
        + [("d1", "misc")]
        + [("d2", "")]  # empty anchors dropped entirely
        + [("d2", None)]
    )
    df = spark.createDataFrame(rows, "dst string, anchor string")
    out = top_anchor_texts(df, k=2).collect()
    by_dst = {}
    for r in out:
        by_dst.setdefault(r["dst"], []).append((r["anchor"], r["n_refs"], r["anchor_rank"]))
    assert by_dst["d1"] == [("home", 5, 1), ("start", 4, 2)]
    assert "d2" not in by_dst


def test_term_postings_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat, the cat ran"),
            (2, "THE dog... the dog; x"),
            (3, "cat"),
        ],
        "doc_id long, text string",
    )
    out = {r["term"]: r for r in term_postings(docs, min_df=2).collect()}
    assert out["the"]["doc_freq"] == 2 and out["the"]["coll_freq"] == 4
    assert out["the"]["max_tf"] == 2
    assert out["cat"]["doc_freq"] == 2 and out["cat"]["coll_freq"] == 3
    assert "dog" not in out  # df = 1
    assert "x" not in out  # below min token length


@pytest.mark.parametrize(
    "cc,policy,age",
    [
        ("no-store", "no-store", None),
        ("no-cache, max-age=300", "no-cache", None),
        ("public, max-age=120", "max-age", 120),
        ("MAX-AGE=5", "max-age", 5),
        ("max-age =  7", "max-age", 7),
        ("private", "none", None),
        ("", "none", None),
        ("pre-no-store", "none", None),  # substring must not false-match
        ("maxi-age=9", "none", None),
    ],
)
def test_cache_control_parse(spark, cc, policy, age):
    df = spark.range(1).select(F.lit(cc).alias("cc"))
    row = df.select(
        cache_directives(F.col("cc")).alias("p"),
        cache_max_age_s(F.col("cc")).alias("a"),
    ).first()
    assert row["p"] == policy
    assert row["a"] == age


@pytest.mark.parametrize(
    "url,cls",
    [
        ("https://h/img/x.jpg", "asset"),
        ("https://h/a/b.PNG", "asset"),
        ("https://h/find?q=sail", "search"),
        ("https://h/list?page=3", "pagination"),
        ("https://h/fleet/page/7", "pagination"),
        ("https://h/yacht/123456", "detail"),
        ("https://h/yacht/abc", "listing"),
        ("https://h/", "listing"),
        ("https://h/x?paged=1&q=z", "search"),  # search outranks pagination
    ],
)
def test_classify_url(spark, url, cls):
    df = spark.range(1).select(F.lit(url).alias("u"))
    assert df.select(classify_url(F.col("u")).alias("c")).first()["c"] == cls


def test_retry_after_seconds(spark):
    from pyspark.sql import functions as F

    from web_scraper_spark.functions.http_headers import retry_after_seconds

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = [
        (1, "120"),
        (2, " 0 "),
        (3, "Fri, 31 Dec 1999 23:59:59 GMT"),   # 59s after now below
        (4, "Wed, 01 Jan 1992 00:00:00 GMT"),   # past -> clamp 0
        (5, "Sunday, 06-Nov-94 08:49:37 GMT"),  # obsolete RFC 850 -> NULL
        (6, "soon"),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "id int, ra string").withColumn(
        "now", F.to_timestamp(F.lit("1999-12-31 23:59:00"))
    )
    out = {
        r["id"]: r["s"]
        for r in df.select(
            "id", retry_after_seconds(F.col("ra"), F.col("now")).alias("s")
        ).collect()
    }
    assert out[1] == 120 and out[2] == 0
    assert out[3] == 59
    assert out[4] == 0
    assert out[5] is None and out[6] is None and out[7] is None
