"""Property test: the Column-expression robots parser ≡ the pure-Python
twin on arbitrary generated robots.txt files (group scoping, agent
runs, comments, junk lines, case noise, delay precedence)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from web_scraper_spark.operators.robots_txt import parse_robots_txt
from web_scraper_spark.oracle.pyrobots import parse_robots

_AGENTS = ["*", "fleetbot", "OtherBot", "GREEDYBOT", "spider"]
_PATHS = ["", "/", "/private", "/a/b", "/a b", "/fleet-only", "/x"]

_line = st.one_of(
    st.sampled_from(["User-agent", "user-agent", "USER-AGENT"]).flatmap(
        lambda kw: st.sampled_from(_AGENTS).map(lambda a: f"{kw}: {a}")
    ),
    st.sampled_from(["Disallow", "disallow", "DISALLOW"]).flatmap(
        lambda kw: st.sampled_from(_PATHS).map(lambda p: f"{kw}: {p}")
    ),
    st.sampled_from(["Disallow:/x", "Disallow :/y", "Disallow: /z # note"]),
    st.integers(min_value=0, max_value=99).map(lambda n: f"Crawl-delay: {n}"),
    st.sampled_from(
        ["Crawl-delay: fast", "crawl-delay:7", "Crawl-Delay: 5 # tight"]
    ),
    st.sampled_from(["Allow", "allow", "ALLOW"]).flatmap(
        lambda kw: st.sampled_from(_PATHS).map(lambda p: f"{kw}: {p}")
    ),
    st.sampled_from(
        ["", "   ", "# full comment", "Allow: /ok$", "Allow: /a/*/c", "Sitemap: https://s/x.xml", "garbage line"]
    ),
)

_robots_txt = st.lists(_line, min_size=0, max_size=18).map("\n".join)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(txt=_robots_txt, agent=st.sampled_from(["*", "fleetbot", "otherbot", "nobody"]))
def test_group_scoped_parser_matches_python_twin(spark, txt, agent):
    df = spark.createDataFrame([("h", txt)], "host string, robots_txt string")
    row = parse_robots_txt(df, user_agent=agent).collect()[0]
    exp_disallow, exp_allow, exp_delay = parse_robots(txt, user_agent=agent)
    assert list(row.disallow) == exp_disallow, txt
    assert list(row.allow) == exp_allow, txt
    assert row.crawl_delay_s == exp_delay, txt
