"""JSON-LD extraction (operators/jsonld.py).

The battery row (`jsonld_extract`) pins the render→extract round-trip
against DuckDB at corpus scale; here: block-pull edges (attribute order,
quote styles, decoys, adjacent blocks) and projection edges (@graph,
numeric prices, author forms, malformed JSON keeps its row).
"""

from __future__ import annotations

from web_scraper_spark.operators.jsonld import extract_jsonld


def _rows(spark, html, url="https://j.example.com/p"):
    df = spark.createDataFrame([(url, html)], "url string, html string")
    return extract_jsonld(df).collect()


def test_block_pull_edges(spark):
    html = (
        '<script type="text/javascript">{"name":"decoy"}</script>'
        '<script async type="application/ld+json">{"@type":"A","name":"first"}</script>'
        "<script type='application/ld+json'>{\"@type\":\"B\",\"name\":\"second\"}</script>"
    )
    rows = _rows(spark, html)
    assert [(r["block_idx"], r["jtype"], r["name"]) for r in rows] == [
        (0, "A", "first"),
        (1, "B", "second"),
    ]


def test_projection_edges(spark):
    html = (
        '<script type="application/ld+json">'
        '{"@type":"Product","name":"N","offers":{"price":12.5,"priceCurrency":"USD"},'
        '"author":{"name":"Ada"},"publisher":"Pub Co"}'
        "</script>"
    )
    r = _rows(spark, html)[0]
    # numeric JSON price surfaces as its literal text
    assert r["price"] == "12.5" and r["price_currency"] == "USD"
    assert r["author_name"] == "Ada" and r["publisher_name"] == "Pub Co"
    # offers as an ARRAY uses the [0] fallback
    html2 = (
        '<script type="application/ld+json">'
        '{"@type":"Product","offers":[{"price":"9.99","priceCurrency":"EUR"}]}'
        "</script>"
    )
    r2 = _rows(spark, html2)[0]
    assert r2["price"] == "9.99" and r2["price_currency"] == "EUR"


def test_graph_and_malformed_keep_rows(spark):
    html = (
        '<script type="application/ld+json">{"@graph":[{"@type":"A"}]}</script>'
        '<script type="application/ld+json">{"bro: ken</script>'
    )
    rows = _rows(spark, html)
    assert len(rows) == 2
    # @graph: no top-level @type, raw preserved for a downstream pass
    assert rows[0]["jtype"] is None and '"@graph"' in rows[0]["raw"]
    assert rows[1]["jtype"] is None and rows[1]["name"] is None
    assert rows[1]["raw"].startswith('{"bro')


def test_no_blocks_no_rows(spark):
    assert _rows(spark, "<html><body>nothing structured</body></html>") == []
