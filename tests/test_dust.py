"""DUST rule mining (operators/dust.py): pair generation linearity,
prefix/suffix factoring edge cases, support counting."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_scraper_spark.operators.dust import (
    factor_pair,
    mine_dust_rules,
    same_content_pairs,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "content_hash string, url string")


def test_pairs_are_adjacent_linear_not_quadratic(spark):
    # a 5-alias cluster yields exactly 4 adjacent pairs, sorted order
    rows = [("h1", f"https://d.example.com/v{i}") for i in range(5)]
    rows += [("h2", "https://other.example.com/x")]  # singleton: no pair
    out = same_content_pairs(_pages(spark, rows)).collect()
    assert len(out) == 4
    assert all(r.url_a < r.url_b for r in out)
    # chain structure: each url appears at most twice (once per side)
    seen = [r.url_a for r in out] + [r.url_b for r in out]
    assert max(seen.count(u) for u in set(seen)) == 2


def test_factor_pair_basic_families(spark):
    pairs = spark.createDataFrame(
        [
            # www-prefix alias: alpha inserted mid-string
            ("https://d.example.com/p/7", "https://www.d.example.com/p/7"),
            # trailing tracking param: embedded id ends with same char as
            # the param value — the suffix clamp must stop at the prefix
            ("https://d.example.com/a/21", "https://d.example.com/a/21?utm=1"),
            # index.html suffix, one url a strict prefix of the other
            ("https://d.example.com/x/5/", "https://d.example.com/x/5/index.html"),
            # identical urls: alpha == beta == ""
            ("https://d.example.com/same", "https://d.example.com/same"),
        ],
        "url_a string, url_b string",
    )
    got = {r.url_a: (r.alpha, r.beta) for r in factor_pair(pairs).collect()}
    assert got["https://d.example.com/p/7"] == ("", "www.")
    assert got["https://d.example.com/a/21"] == ("", "?utm=1")
    assert got["https://d.example.com/x/5/"] == ("", "index.html")
    assert got["https://d.example.com/same"] == ("", "")


def test_mine_rules_support_threshold(spark):
    rows = []
    for i in range(6):  # 6 www-alias clusters -> support 6
        rows += [
            (f"w{i}", f"https://d.example.com/p/{i}"),
            (f"w{i}", f"https://www.d.example.com/p/{i}"),
        ]
    for i in range(2):  # 2 print-view clusters -> support 2
        rows += [
            (f"p{i}", f"https://d.example.com/q/{i}"),
            (f"p{i}", f"https://d.example.com/q/{i}?print=1"),
        ]
    rows += [  # one-off: below min_support 2
        ("o", "https://d.example.com/r/1"),
        ("o", "https://d.example.com/r/1-amp"),
    ]
    out = mine_dust_rules(_pages(spark, rows), min_support=2).collect()
    rules = {(r.alpha, r.beta): r.support for r in out}
    assert rules == {("", "www."): 6, ("", "?print=1"): 2}
    # highest support first
    assert out[0].support == 6


def test_mine_rules_no_python_udf(spark):
    df = _pages(spark, [("h", "https://a.example.com/1")])
    plan = mine_dust_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
