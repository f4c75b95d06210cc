"""Sitemap parsing + frontier wiring.

The battery row (`sitemap_parse`) pins the render→parse round-trip
against DuckDB at corpus scale; here: malformed-XML behavior, index
vs urlset classification, and that sitemap entries merge into an
existing frontier through the same (url_hash, url) anti-join contract
as outlink discoveries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from web_scraper_spark.operators.sitemap import (
    parse_sitemap_entries,
    sitemap_frontier_entries,
)
from web_scraper_spark.plans.rounds import FRONTIER_COLS

URLSET = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url>
  <loc> https://a.example.com/p/1 </loc>
  <lastmod>2025-06-01</lastmod>
</url>
<url><loc>https://a.example.com/p/2</loc></url>
<url><loc>https://a.example.com/p/3</loc><lastmod>not-a-date</lastmod></url>
<url><loc></loc></url>
<url><loc>https://a.example.com/unclosed
</urlset>
"""

INDEX = """<sitemapindex>
<sitemap><loc>https://a.example.com/sitemap-pages.xml</loc>
<lastmod>2025-06-02T10:00:00+00:00</lastmod></sitemap>
</sitemapindex>"""


def _parse(spark, body, url="https://a.example.com/sitemap.xml"):
    df = spark.createDataFrame([(url, body)], "url string, body string")
    return parse_sitemap_entries(df).collect()


def test_urlset_parse_edges(spark):
    rows = {r["loc"]: r for r in _parse(spark, URLSET)}
    # whitespace-padded loc is trimmed; lastmod parsed
    assert "https://a.example.com/p/1" in rows
    assert str(rows["https://a.example.com/p/1"]["lastmod_date"]) == "2025-06-01"
    # no lastmod → NULLs
    assert rows["https://a.example.com/p/2"]["lastmod"] is None
    # bad lastmod survives as raw string, date is NULL (try_cast)
    r3 = rows["https://a.example.com/p/3"]
    assert r3["lastmod"] == "not-a-date" and r3["lastmod_date"] is None
    # empty loc dropped; unclosed <url> block dropped (non-greedy regex
    # never crosses into it) — exactly 3 entries
    assert len(rows) == 3
    assert all(r["kind"] == "url" for r in rows.values())


def test_sitemapindex_parse(spark):
    rows = _parse(spark, INDEX, url="https://a.example.com/sitemap_index.xml")
    assert len(rows) == 1
    assert rows[0]["kind"] == "sitemap"
    assert rows[0]["loc"] == "https://a.example.com/sitemap-pages.xml"
    # full W3C datetime: date part parsed
    assert str(rows[0]["lastmod_date"]) == "2025-06-02"


def test_sitemap_entries_merge_into_frontier(spark):
    sitemaps = spark.createDataFrame(
        [
            (
                "https://a.example.com/sitemap.xml",
                "<urlset>"
                # canonicalizer must fold these before the anti-join:
                "<url><loc>HTTPS://A.Example.COM:443/known?b=2&amp;x=1#f</loc></url>"
                "<url><loc>https://a.example.com/new</loc></url>"
                "</urlset>".replace("&amp;", "&"),
            )
        ],
        "url string, body string",
    )
    entries = parse_sitemap_entries(sitemaps)
    seeds = spark.createDataFrame(
        [("a.example.com", 2)], "host string, seed_rank int"
    )
    fe = sitemap_frontier_entries(entries, seeds=seeds, n_buckets=4, round_id=7)
    assert fe.columns == FRONTIER_COLS

    # existing frontier already holds /known (canonical form)
    known = fe.filter(F.col("url") == "https://a.example.com/known?b=2&x=1")
    assert known.count() == 1
    frontier = known.select("url_hash", "url")
    merged = fe.join(frontier, ["url_hash", "url"], "left_anti").collect()
    assert [r["url"] for r in merged] == ["https://a.example.com/new"]
    r = merged[0]
    assert r["depth"] == 1 and r["discovery_round"] == 7
    assert r["seed_rank"] == 2 and r["state"] == "pending"


def test_non_seed_host_gets_discovered_rank(spark):
    sitemaps = spark.createDataFrame(
        [
            (
                "https://b.example.com/sitemap.xml",
                "<urlset><url><loc>https://b.example.com/p</loc></url></urlset>",
            )
        ],
        "url string, body string",
    )
    fe = sitemap_frontier_entries(
        parse_sitemap_entries(sitemaps), seeds=None, n_buckets=4
    ).collect()
    from web_scraper_spark.operators.priority import DISCOVERED_SEED_RANK

    assert fe[0]["seed_rank"] == DISCOVERED_SEED_RANK


def test_changefreq_priority_hints(spark):
    from web_scraper_spark.operators.sitemap import changefreq_revisit_days

    body = (
        "<urlset>"
        "<url><loc>https://h/p1</loc><changefreq> WEEKLY </changefreq>"
        "<priority>0.8</priority></url>"
        "<url><loc>https://h/p2</loc><changefreq>sometimes</changefreq>"
        "<priority>1.5</priority></url>"
        "<url><loc>https://h/p3</loc><priority>abc</priority></url>"
        "<url><loc>https://h/p4</loc><changefreq>never</changefreq>"
        "<priority>1.0</priority></url>"
        "</urlset>"
        "<sitemapindex><sitemap><loc>https://h/child.xml</loc>"
        "<changefreq>daily</changefreq><priority>0.5</priority>"
        "</sitemap></sitemapindex>"
    )
    df = spark.createDataFrame(
        [("https://h/sitemap.xml", body)], "url string, body string"
    )
    out = parse_sitemap_entries(df)
    rows = {r["loc"]: r for r in out.collect()}
    # valid token lowercased; in-range priority kept
    assert rows["https://h/p1"]["changefreq"] == "weekly"
    assert rows["https://h/p1"]["priority"] == 0.8
    # invalid token and out-of-range priority both NULL (no clamping)
    assert rows["https://h/p2"]["changefreq"] is None
    assert rows["https://h/p2"]["priority"] is None
    # unparseable priority NULL; absent changefreq NULL
    assert rows["https://h/p3"]["changefreq"] is None
    assert rows["https://h/p3"]["priority"] is None
    # boundary 1.0 kept
    assert rows["https://h/p4"]["priority"] == 1.0
    # hint fields are page-entry-only: sitemap rows stay NULL
    child = rows["https://h/child.xml"]
    assert child["kind"] == "sitemap"
    assert child["changefreq"] is None and child["priority"] is None
    # revisit mapping: sub-daily -> 0, never/unknown/NULL -> NULL
    m = {
        r["loc"]: r["d"]
        for r in out.select(
            "loc", changefreq_revisit_days(out["changefreq"]).alias("d")
        ).collect()
    }
    assert m["https://h/p1"] == 7
    assert m["https://h/p2"] is None
    assert m["https://h/p4"] is None
