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


MULTI_AGENT_ROBOTS = """User-agent: *
Disallow: /private
Crawl-delay: 30

User-agent: fleetbot
User-agent: otherbot
Disallow: /fleet-only
Crawl-delay: 5

User-agent: greedybot
Disallow: /
"""


def test_group_scoped_named_agent_overrides_star(spark):
    """A named agent gets ONLY its group's rules, not * rules."""
    df = spark.createDataFrame(
        [("h1", MULTI_AGENT_ROBOTS)], "host string, robots_txt string"
    )
    star = {r.host: r for r in parse_robots_txt(df).collect()}
    named = {r.host: r for r in parse_robots_txt(df, user_agent="FleetBot").collect()}
    greedy = {r.host: r for r in parse_robots_txt(df, user_agent="greedybot").collect()}
    unknown = {r.host: r for r in parse_robots_txt(df, user_agent="nobody").collect()}

    assert star["h1"].disallow == ["/private"]
    assert star["h1"].crawl_delay_s == 30
    # case-insensitive agent match; shares the group with otherbot
    assert named["h1"].disallow == ["/fleet-only"]
    assert named["h1"].crawl_delay_s == 5
    assert greedy["h1"].disallow == ["/"]
    assert greedy["h1"].crawl_delay_s == 30  # no in-group delay -> default
    # unnamed agent falls back to the * group
    assert unknown["h1"].disallow == ["/private"]
    assert unknown["h1"].crawl_delay_s == 30


def test_group_scoped_multi_agent_run(spark):
    """Both agents of a shared user-agent run own the directives."""
    df = spark.createDataFrame(
        [("h1", MULTI_AGENT_ROBOTS)], "host string, robots_txt string"
    )
    other = {r.host: r for r in parse_robots_txt(df, user_agent="otherbot").collect()}
    assert other["h1"].disallow == ["/fleet-only"]
    assert other["h1"].crawl_delay_s == 5


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
