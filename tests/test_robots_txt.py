"""robots.txt parser → politeness rules plumbing."""

from __future__ import annotations

from web_scraper_spark.operators.politeness import split_robots
from web_scraper_spark.operators.robots_txt import parse_robots_txt

ROBOTS = """# fleet rules
User-agent: *
Disallow: /private   # members area
Disallow: /admin
Disallow:
Crawl-delay: 10
crawl-delay: 15
Sitemap: https://h1/sitemap.xml
"""


def test_parse_robots_txt(spark):
    df = spark.createDataFrame([("h1", ROBOTS), ("h2", "")], "host string, robots_txt string")
    rows = {r.host: r for r in parse_robots_txt(df).collect()}
    assert rows["h1"].disallow == ["/private", "/admin"]
    assert rows["h1"].crawl_delay_s == 15  # last occurrence wins
    assert rows["h2"].disallow == []
    assert rows["h2"].crawl_delay_s == 30  # default


def test_parsed_rules_feed_split_robots(spark):
    rules = parse_robots_txt(
        spark.createDataFrame([("h1", ROBOTS)], "host string, robots_txt string")
    )
    cand = spark.createDataFrame(
        [
            ("h1", "https://h1/private/x"),
            ("h1", "https://h1/public/y"),
        ],
        "host string, url string",
    )
    allowed, blocked = split_robots(cand, rules)
    assert {r.url for r in allowed.collect()} == {"https://h1/public/y"}
    assert {r.url for r in blocked.collect()} == {"https://h1/private/x"}
