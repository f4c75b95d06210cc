"""RSS/Atom feed parsing (operators/feeds.py).

The battery row (`feed_parse`) pins the render→parse round-trip against
DuckDB at corpus scale; here: grammar edge cases — hybrid feeds, missing
elements, RFC 822 zone forms (GMT name, numeric offsets, minute-only
times), ISO-8601 millisecond/offset variants, and that one malformed
date never nulls out the rest of the feed.
"""

from __future__ import annotations

from web_scraper_spark.operators.feeds import parse_feed_entries

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
<title>Chan title outside items</title>
<link>https://n.example.com/</link>
<item>
  <title>First</title>
  <link> https://n.example.com/a/1 </link>
  <guid isPermaLink="false">urn:a:1</guid>
  <pubDate>Mon, 05 Jan 1998 09:15:07 GMT</pubDate>
</item>
<item>
  <title>Offset</title>
  <link>https://n.example.com/a/2</link>
  <pubDate>5 Jan 1998 09:15:07 +0300</pubDate>
</item>
<item>
  <title>MinuteOnly</title>
  <link>https://n.example.com/a/3</link>
  <pubDate>Wed, 07 Jan 1998 09:15 UT</pubDate>
</item>
<item>
  <title>BadDate</title>
  <link>https://n.example.com/a/4</link>
  <pubDate>sometime last week</pubDate>
</item>
<item>
  <link>https://n.example.com/a/5</link>
</item>
</channel></rss>
"""

ATOM = """<feed xmlns="http://www.w3.org/2005/Atom">
<title>Feed title outside entries</title>
<link rel="self" href="https://n.example.com/atom.xml"/>
<entry>
  <title>Iso</title>
  <link rel="alternate" href="https://n.example.com/b/1"/>
  <id>urn:b:1</id>
  <updated>1998-01-05T09:15:07Z</updated>
</entry>
<entry>
  <title>Millis</title>
  <link href="https://n.example.com/b/2"/>
  <id>urn:b:2</id>
  <updated>1998-01-05T09:15:07.123+02:00</updated>
</entry>
<entry>
  <title>NoLink</title>
  <id>urn:b:3</id>
</entry>
</feed>
"""


def _parse(spark, body, url="https://n.example.com/feed.xml"):
    df = spark.createDataFrame([(url, body)], "url string, body string")
    return parse_feed_entries(df).collect()


def test_rss_edges(spark):
    rows = _parse(spark, RSS)
    assert [r["kind"] for r in rows] == ["rss"] * 5
    assert [r["entry_idx"] for r in rows] == [0, 1, 2, 3, 4]
    by_link = {r["link"]: r for r in rows}
    # channel-level title/link never leak into entries
    assert "https://n.example.com/" not in by_link
    r1 = by_link["https://n.example.com/a/1"]  # padding trimmed
    assert r1["title"] == "First" and r1["entry_id"] == "urn:a:1"
    assert str(r1["published_ts"]) == "1998-01-05 09:15:07"
    # numeric offset normalizes to the same UTC instant
    assert str(by_link["https://n.example.com/a/2"]["published_ts"]) == (
        "1998-01-05 06:15:07"
    )
    # minute-only time + 'UT' zone name
    assert str(by_link["https://n.example.com/a/3"]["published_ts"]) == (
        "1998-01-07 09:15:00"
    )
    # unparseable date: raw string kept, ts NULL, row survives
    r4 = by_link["https://n.example.com/a/4"]
    assert r4["published"] == "sometime last week" and r4["published_ts"] is None
    # missing elements are NULL, not ''
    r5 = by_link["https://n.example.com/a/5"]
    assert r5["title"] is None and r5["entry_id"] is None and r5["published"] is None


def test_atom_edges(spark):
    rows = _parse(spark, ATOM)
    assert [r["kind"] for r in rows] == ["atom"] * 3
    by_id = {r["entry_id"]: r for r in rows}
    # rel=self feed-level link is outside entry blocks
    r1 = by_id["urn:b:1"]
    assert r1["link"] == "https://n.example.com/b/1"
    assert str(r1["published_ts"]) == "1998-01-05 09:15:07"
    # fractional seconds + numeric offset
    assert str(by_id["urn:b:2"]["published_ts"]).startswith("1998-01-05 07:15:07")
    assert by_id["urn:b:3"]["link"] is None


def test_hybrid_feed_orders_rss_first(spark):
    body = (
        "<rss><channel>"
        + "<item><link>https://n.example.com/r/1</link></item>"
        + "</channel></rss>"
        + '<feed><entry><link href="https://n.example.com/e/1"/></entry></feed>'
    )
    rows = _parse(spark, body)
    assert [(r["kind"], r["entry_idx"]) for r in rows] == [("rss", 0), ("atom", 1)]


def test_empty_and_garbage_bodies(spark):
    assert _parse(spark, "") == []
    assert _parse(spark, "<html><body>not a feed</body></html>") == []
    # unclosed item never swallows the document
    assert _parse(spark, "<item><link>https://x/1</link>") == []
