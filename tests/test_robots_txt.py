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


WILDCARD_ROBOTS = """User-agent: *
Disallow: /search
Disallow: /*.pdf$
Disallow: /cart/*/checkout
Allow: /search/public
Allow: /docs/*.pdf$
Crawl-delay: 10
"""


def test_wildcard_and_allow_rules(spark):
    """RFC 9309 §2.2.2: * / trailing-$ wildcards; longest (most-octets)
    match wins; Allow wins specificity ties; no match → allowed."""
    rules = parse_robots_txt(
        spark.createDataFrame(
            [("h1", WILDCARD_ROBOTS)], "host string, robots_txt string"
        )
    )
    assert rules.collect()[0].allow == ["/search/public", "/docs/*.pdf$"]
    urls = {
        "https://h1/search/q": "B",  # plain prefix disallow
        "https://h1/search/public/1": "A",  # longer Allow overrides
        "https://h1/report.pdf": "B",  # *.pdf$ anchored wildcard
        "https://h1/report.pdf/view": "A",  # $ anchor: not at end
        "https://h1/docs/a.pdf": "A",  # Allow /docs/*.pdf$ (12 octets) beats /*.pdf$ (7)
        "https://h1/cart/42/checkout": "B",  # mid-rule *
        "https://h1/cart/42/items": "A",
        "https://h1/other": "A",
    }
    cand = spark.createDataFrame(
        [("h1", u) for u in urls], "host string, url string"
    )
    allowed, blocked = split_robots(cand, rules)
    got = {r.url: "A" for r in allowed.collect()}
    got.update({r.url: "B" for r in blocked.collect()})
    assert got == urls


def test_decision_matches_python_twin_on_tricky_shapes(spark):
    """Engine Column fold ≡ oracle/pyrobots.robots_blocked on regex
    metacharacters, tie-breaks, and empty/NULL rule arrays."""
    from web_scraper_spark.oracle.pyrobots import robots_blocked

    robots = spark.createDataFrame(
        [
            ("h1", ["/a(b)", "/c+d", "/e.f"], ["/a(b)c"], 10),
            ("h2", ["/p"], ["/p"], 10),  # exact tie → Allow wins
            ("h3", [], [], 10),
            ("h4", ["/$"], ["/ok"], 10),  # disallow exactly "/"
        ],
        "host string, disallow array<string>, allow array<string>, crawl_delay_s int",
    )
    paths = ["/a(b)", "/a(b)c", "/aXb", "/c+d", "/ccd", "/e.f", "/eXf",
             "/p", "/p/x", "/", "/ok", "/other"]
    cand = spark.createDataFrame(
        [(h, p, f"https://{h}{p}") for h in ["h1", "h2", "h3", "h4"] for p in paths],
        "host string, path string, url string",
    )
    allowed, blocked = split_robots(cand, robots)
    got = {(r.host, r.path): False for r in allowed.collect()}
    got.update({(r.host, r.path): True for r in blocked.collect()})
    rules = {r.host: (list(r.disallow), list(r.allow)) for r in robots.collect()}
    for h in ["h1", "h2", "h3", "h4"]:
        dis, alw = rules.get(h, ([], []))
        for p in paths:
            assert got[(h, p)] == robots_blocked(p, dis, alw), (h, p)
    # regex metachars are literal: /aXb, /ccd, /eXf must not be blocked
    assert not got[("h1", "/aXb")] and not got[("h1", "/ccd")] and not got[("h1", "/eXf")]
    assert not got[("h2", "/p")]  # tie → Allow
    assert got[("h4", "/")] and not got[("h4", "/ok")]


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


def test_match_target_includes_query_and_root(spark):
    """ADVICE r3 (medium): RFC 9309 matches path+query, and the empty
    path of a bare https://host is '/'. Query-bearing rules like
    'Disallow: /*?' and 'Disallow: /search?q=' must actually block, and
    'Disallow: /' must block the root URL."""
    from web_scraper_spark.oracle.pyrobots import match_target, robots_blocked

    robots = spark.createDataFrame(
        [
            ("h1", ["/*?"], [], 10),            # any query string
            ("h2", ["/search?q="], [], 10),     # query-prefix rule
            ("h3", ["/"], [], 10),              # block everything incl. root
        ],
        "host string, disallow array<string>, allow array<string>, crawl_delay_s int",
    )
    urls = {
        ("h1", "https://h1/p"): False,
        ("h1", "https://h1/p?a=1"): True,
        ("h1", "https://h1/p?"): True,          # bare '?' still a query
        ("h2", "https://h2/search?q=1"): True,
        ("h2", "https://h2/search?other=1"): False,
        ("h2", "https://h2/search"): False,
        ("h3", "https://h3"): True,             # empty path → '/'
        ("h3", "https://h3/x"): True,
    }
    cand = spark.createDataFrame(
        [(h, u) for (h, u) in urls], "host string, url string"
    )
    allowed, blocked = split_robots(cand, robots)
    got = {(r.host, r.url): False for r in allowed.collect()}
    got.update({(r.host, r.url): True for r in blocked.collect()})
    assert got == urls
    # pure-Python twin agrees via the same match target
    rules = {r.host: (list(r.disallow), list(r.allow)) for r in robots.collect()}
    for (h, u), want in urls.items():
        dis, alw = rules[h]
        assert robots_blocked(match_target(u), dis, alw) == want, (h, u)


def test_specificity_counts_octets_not_characters(spark):
    """ADVICE r3: RFC 9309 longest-match precedence is over OCTETS.
    Discriminating case — Disallow '/é' (2 chars, 3 octets) vs Allow
    '/*' (2 chars, 2 octets) on path '/éx': character counting ties
    (tie → Allow → not blocked); octet counting gives Disallow strictly
    more specificity → BLOCKED. Engine and twin must both block."""
    from pyspark.sql import functions as F

    from web_scraper_spark.operators.robots_txt import (
        compile_rule_patterns,
        robots_blocked_expr,
    )
    from web_scraper_spark.oracle.pyrobots import robots_blocked

    def decide(dis: list[str], alw: list[str], path: str) -> bool:
        compiled = compile_rule_patterns(
            spark.createDataFrame(
                [("h1", dis, alw, 10)],
                "host string, disallow array<string>, "
                "allow array<string>, crawl_delay_s int",
            )
        )
        return compiled.select(
            robots_blocked_expr(F.lit(path), F.col("rules")).alias("b")
        ).collect()[0].b

    assert decide(["/é"], ["/*"], "/éx") is True  # octets: 3 > 2
    assert robots_blocked("/éx", ["/é"], ["/*"]) is True
    # mirrored: Allow non-ASCII beats the shorter-in-octets Disallow
    assert decide(["/*"], ["/é"], "/éx") is False
    assert robots_blocked("/éx", ["/*"], ["/é"]) is False
    # ASCII control: same shape, same octet/char length → tie → Allow
    assert decide(["/a"], ["/*"], "/ax") is False
    assert robots_blocked("/ax", ["/a"], ["/*"]) is False


def test_sitemap_records_are_group_independent(spark):
    """RFC 9309 §2.3: Sitemap lines apply regardless of the user-agent
    group they sit inside; matching is case-insensitive, comments are
    stripped, relative values are dropped, duplicates collapse."""
    from web_scraper_spark.operators.robots_txt import robots_sitemaps

    txt = (
        "User-agent: googlebot\n"
        "Disallow: /g\n"
        "Sitemap: https://a.com/inside-foreign-group.xml\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /private\n"
        "sitemap:https://a.com/news.xml   # comment\n"
        "SITEMAP:  https://a.com/a.xml\r\n"
        "Sitemap: /relative.xml\n"
        "Sitemap: ftp://a.com/wrong-scheme.xml\n"
        "Sitemap: https://a.com/news.xml\n"
    )
    df = spark.createDataFrame([("a.com", txt), ("b.com", "User-agent: *\nDisallow:\n")],
                               ["host", "robots_txt"])
    got = {
        (r["host"], r["sitemap_url"])
        for r in robots_sitemaps(df).collect()
    }
    assert got == {
        ("a.com", "https://a.com/inside-foreign-group.xml"),
        ("a.com", "https://a.com/news.xml"),
        ("a.com", "https://a.com/a.xml"),
    }
