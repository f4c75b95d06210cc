"""Registrable-domain (eTLD+1) extraction: PSL-algorithm fixed cases +
hypothesis cross-check against the pure-Python twin."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from web_scraper_spark.functions.domains import (
    DEFAULT_SUFFIXES,
    registrable_domain,
)
from web_scraper_spark.oracle.pydomains import registrable_domain_py

CASES = {
    "www.example.com": "example.com",
    "example.com": "example.com",
    "a.b.example.co.uk": "example.co.uk",
    "example.co.uk": "example.co.uk",
    "co.uk": None,  # is itself a public suffix
    "com": None,  # single label
    "deep.sub.shop.com.au": "shop.com.au",
    # wildcard *.ck: every 1-level-under-.ck is a suffix
    "a.b.ck": "a.b.ck",
    "b.ck": None,
    # exception !www.ck: www.ck IS registrable
    "www.ck": "www.ck",
    "foo.www.ck": "www.ck",
    # implicit * default: unmatched TLD → last two labels
    "site.unknowntld": "site.unknowntld",
    "a.site.unknowntld": "site.unknowntld",
}


def test_fixed_cases(spark):
    df = spark.createDataFrame([(h,) for h in CASES], "host string")
    got = {
        r.host: r.reg
        for r in df.select(
            "host", registrable_domain(F.col("host")).alias("reg")
        ).collect()
    }
    assert got == CASES


def test_fixed_cases_match_twin():
    for h, want in CASES.items():
        assert registrable_domain_py(h, DEFAULT_SUFFIXES) == want, h


_LABELS = ["a", "b", "www", "shop", "ck", "uk", "co", "com", "unknowntld", "x"]
_hosts = st.lists(
    st.sampled_from(_LABELS), min_size=1, max_size=5
).map(".".join)
_rule = st.one_of(
    st.lists(st.sampled_from(_LABELS), min_size=1, max_size=3).map(".".join),
    st.lists(st.sampled_from(_LABELS), min_size=1, max_size=2).map(
        lambda ls: "*." + ".".join(ls)
    ),
    st.lists(st.sampled_from(_LABELS), min_size=1, max_size=3).map(
        lambda ls: "!" + ".".join(ls)
    ),
)
_rules = st.lists(_rule, min_size=0, max_size=8)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(hosts=st.lists(_hosts, min_size=1, max_size=8), rules=_rules)
def test_engine_matches_twin_on_random_rules(spark, hosts, rules):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = [
        r.reg
        for r in df.select(
            registrable_domain(F.col("host"), suffixes=rules).alias("reg")
        ).collect()
    ]
    want = [registrable_domain_py(h, rules) for h in hosts]
    assert got == want, (hosts, rules)
