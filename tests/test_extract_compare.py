"""Extraction UDF unit behavior + the §3.3 price-comparison query."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from web_scraper_spark.functions.prices import (
    epoch_millis,
    format_currency_col,
    format_date_for_api,
    parse_price,
    strip_company_suffix,
)
from web_scraper_spark.operators.compare import compare_prices
from web_scraper_spark.operators.extract import extract_pages
from web_scraper_spark.sources.fixtures import (
    FIELDS,
    extract_text_py,
    format_currency,
    render_page,
)


def _pages_df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


def test_extract_fields_and_text(spark):
    fields = {k: f"v_{k}" for k in FIELDS}
    fields["total_price"] = "1.234,56"
    html = render_page(fields, ["https://h.example.com/next"], "T")
    rows = [("https://h.example.com/a", datetime(2025, 1, 1), html.encode(), "", "en")]
    out = extract_pages(_pages_df(spark, rows)).collect()[0]
    assert out.details.total_price == "1.234,56"
    assert out.details.discount_name == "v_discount_name"
    assert out.text == extract_text_py(html)
    assert out.outlinks == ["https://h.example.com/next"]


def test_extract_missing_field_is_null(spark):
    fields = {k: "x" for k in FIELDS}
    fields["commission_percent"] = None
    html = render_page(fields, [], "T")
    rows = [("https://h/a", datetime(2025, 1, 1), html.encode(), "", "en")]
    out = extract_pages(_pages_df(spark, rows)).collect()[0]
    assert out.details.commission_percent is None
    assert "commission_percent" not in out.text


def test_extract_error_page_yields_nulls(spark):
    html = "<!--STATUS:500--><html><body>boom</body></html>"
    rows = [("https://h/a", datetime(2025, 1, 1), html.encode(), "", "en")]
    out = extract_pages(_pages_df(spark, rows)).collect()[0]
    assert out.details is None and out.text is None and out.outlinks == []


def test_scalar_price_functions(spark):
    df = spark.createDataFrame(
        [("1.234,56", 1234.56, "2025-04-12 17:00:00", "Acme Turizm")],
        "s string, v double, d string, comp string",
    ).select(
        parse_price(F.col("s")).alias("parsed"),
        format_currency_col(F.col("v")).alias("formatted"),
        format_date_for_api(F.col("d")).alias("api_date"),
        epoch_millis(F.to_timestamp("d")).alias("ms"),
        strip_company_suffix(F.col("comp")).alias("comp2"),
        parse_price(F.lit("")).alias("empty"),
        parse_price(F.lit("junk")).alias("junk"),
    )
    r = df.first()
    assert r.parsed == 1234.56
    assert r.formatted == "1.234,56" == format_currency(1234.56)
    assert r.api_date == "12.04.2025 17:00"  # nausys_tracker.py:443-450 shape
    assert r.ms % 1000 == 0
    assert r.comp2 == "Acme"
    assert r.empty == 0.0 and r.junk == 0.0


def _extraction_row(comp, yid, pf, pt, total, port, round_id=1):
    details = {k: "" for k in FIELDS}
    details["total_price"] = format_currency(total)
    details["list_price"] = format_currency(total)
    details["port_from"] = port
    return (round_id, f"https://x/{comp}/{yid}/{pf}", 0, comp, yid, pf, pt, details, "", )


def test_compare_prices_full_outer_and_flags(spark):
    schema = (
        "round_id int, url string, url_hash long, competitor string, yacht_id string,"
        " period_from string, period_to string,"
        " details struct<" + ",".join(f"{f}:string" for f in FIELDS) + ">, text string"
    )
    rows = [
        # overlapping period: ours cheaper → durum 0
        _extraction_row("rival", "y1", "2025-04-12 17:00:00", "2025-04-19 08:00:00", 2000.0, "Fethiye"),
        _extraction_row("us", "m1", "2025-04-12 17:00:00", "2025-04-19 08:00:00", 1500.0, "Gocek"),
        # competitor-only period → bizim_fiyat 0, durum 0 (0-2000 < 0)
        _extraction_row("rival", "y1", "2025-04-19 17:00:00", "2025-04-26 08:00:00", 2000.0, "Fethiye"),
        # ours-only period → rakip 0 → durum 1
        _extraction_row("us", "m1", "2025-04-26 17:00:00", "2025-05-03 08:00:00", 1800.0, "Gocek"),
        # stale row superseded by a newer round (J5 latest-wins)
        _extraction_row("rival", "y1", "2025-04-12 17:00:00", "2025-04-19 08:00:00", 9999.0, "Old", round_id=0),
    ]
    df = spark.createDataFrame(rows, schema)
    out = compare_prices(df, "rival", "y1", "us", "m1").collect()
    assert [r.durum for r in out] == [0, 0, 1]
    r0 = out[0]
    assert r0.bizim_fiyat == 1500.0 and r0.rakip_fiyat == 2000.0
    assert r0.fark == 500.0
    assert r0.rakip_konum == "Fethiye" and r0.bizim_konum == "Gocek"
    assert r0.tarih == "2025-04-12 17:00:00 - 2025-04-19 08:00:00"
    # latest round won (9999 ignored)
    assert out[1].rakip_fiyat == 2000.0
