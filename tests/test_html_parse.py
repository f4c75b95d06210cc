"""General (real-world) HTML extraction — spec conformance + parity.

Three invariants:

1. ``parse_html_py`` matches the hand-written adversarial spec
   (sources/adversarial_html.py) on every case — expectations were
   derived by hand from the extraction contract, not by running the
   extractor.
2. On every synthetic fixture page the general path is byte-identical
   to the grammar path (fields, text, outlinks) — so switching
   ``parser="html"`` on in a crawl round changes nothing on pages the
   grammar can parse, while additionally surviving tag soup.
3. The Spark ``extract_pages(parser="html")`` stage produces the same
   rows as the pure-Python twin (Arrow plumbing adds nothing).
"""

from __future__ import annotations

import pytest

from web_scraper_spark.operators.html_parse import parse_html_py
from web_scraper_spark.sources.adversarial_html import (
    N_CASES,
    SPEC,
    expected_case,
    render_case,
)
from web_scraper_spark.sources.fixtures import (
    FIELDS,
    build_world,
    extract_fields_py,
    extract_outlinks_py,
    extract_text_py,
)

CASE_NAMES = [c[0] for c in SPEC]


@pytest.mark.parametrize("idx", range(N_CASES), ids=CASE_NAMES)
@pytest.mark.parametrize("doc_id", ["7", "12345"])
def test_adversarial_spec(idx: int, doc_id: str) -> None:
    html = render_case(idx, doc_id)
    want_text, want_fields, want_links = expected_case(idx, doc_id)
    fields, text, links = parse_html_py(html)
    assert text == want_text
    assert links == want_links
    for f in FIELDS:
        assert fields[f] == want_fields.get(f), f
    # fields not in the expectation are absent from the page -> None
    for f, v in fields.items():
        if f not in want_fields:
            assert v is None, f


def test_fixture_world_byte_parity() -> None:
    """General path == grammar path on EVERY fixture page (881 at the
    default config): same 16 fields, byte-identical text, same links."""
    world = build_world()
    checked = 0
    for page in world.pages:
        html = page["html"]
        if isinstance(html, (bytes, bytearray)):
            html = html.decode("utf-8", errors="replace")
        if html.startswith("<!--STATUS:500-->"):
            continue
        hf, ht, hl = parse_html_py(html)
        assert ht == extract_text_py(html)
        assert hf == extract_fields_py(html)
        assert hl == extract_outlinks_py(html)
        checked += 1
    assert checked > 500


def test_spark_html_parser_stage(spark) -> None:
    """extract_pages(parser="html") through Arrow == pure-Python twin."""
    from pyspark.sql import functions as F

    from web_scraper_spark.operators.extract import extract_pages

    rows = [
        (f"{name}:{doc}", render_case(i, doc).encode())
        for i, name in enumerate(CASE_NAMES)
        for doc in ("3", "99")
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {
        r["url"]: r
        for r in extract_pages(pages, parser="html")
        .select("url", "details", "text", "outlinks")
        .collect()
    }
    assert len(got) == len(rows)
    for url, raw in rows:
        fields, text, links = parse_html_py(raw.decode())
        r = got[url]
        assert r["text"] == text
        assert list(r["outlinks"]) == links
        assert r["details"].asDict() == fields


def test_malformed_garbage_never_raises() -> None:
    """One hostile page must never kill a round: truncation, raw '<',
    nulls, mixed encodings survive with the same contract shape."""
    hostile = [
        "",
        "<",
        "plain text only",
        "<a href=",
        "<span id='x'>unclosed",
        "a < b and c > d",
        "<html><body>" + "<div>" * 500 + "deep" ,
        "\x00\x01<p>bin</p>",
        "<p>trunca<ted attr='",
        "<!--- weird comment --->tail",
    ]
    for h in hostile:
        fields, text, links = parse_html_py(h)
        assert isinstance(text, str)
        assert isinstance(links, list)
        assert set(fields) == set(FIELDS)
