"""Parity edges from ADVICE round 2: the ' Turizm' strip applies to the
competitor FALLBACK too when a boat matched but lacks 'company'
(mmk_tracker.py:152-154), and the F4 sanity gate accepts Unicode digits
like Python's ``re.search(r'^\\d', ...)`` does."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_scraper_spark.functions.prices import is_valid_price_text
from web_scraper_spark.operators.listings import enrich_listings


def test_company_strip_applies_to_fallback_when_boat_matched(spark):
    tasks = spark.createDataFrame(
        [
            ("Acme Turizm", "y1", "1"),  # matched boat, company present
            ("Acme Turizm", "y2", "2"),  # matched boat, company ABSENT
            ("Acme Turizm", "y3", "99"),  # no matching boat
        ],
        "competitor string, yacht_name string, yacht_id string",
    )
    boats = spark.createDataFrame(
        [
            ("Acme Turizm", "1", "b", None, "Full 1", "Best Turizm", "p", 1.0),
            ("Acme Turizm", "2", "b", None, "Full 2", None, "p", 2.0),
        ],
        "competitor string, boat_id string, base_id string, "
        "product array<struct<id:string>>, full_name string, "
        "company string, port string, deposit double",
    )
    got = {
        r.yacht_id: r.company_name
        for r in enrich_listings(tasks, boats).collect()
    }
    # matched + company: stripped listing company
    assert got["1"] == "Best"
    # matched + NO company key: boat_data.get('company', competitor_name)
    # falls back to the competitor and the strip STILL applies
    assert got["2"] == "Acme"
    # no match at all: competitor name verbatim (reference else-branch)
    assert got["99"] == "Acme Turizm"


def test_price_sanity_accepts_unicode_digits(spark):
    rows = [("５00 €",), ("١٢٣ €",), ("x00 €",), ("NaN €",), (None,)]
    df = spark.createDataFrame(rows, "t string")
    got = [
        r.v
        for r in df.select(is_valid_price_text(F.col("t")).alias("v")).collect()
    ]
    assert got == [True, True, False, False, False]
