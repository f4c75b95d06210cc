"""JSON-LD structured-data extraction: schema.org blocks from HTML.

``<script type="application/ld+json">`` is the dominant carrier of
machine-readable page semantics on the public web (schema.org Article,
Product, Organization, ...). A webtext pipeline mines it for typed
metadata that the free-text extractors can only guess at — publication
dates for the revisit scheduler (operators/revisit.py), author/publisher
identity for provenance, product/price fields that generalize the
reference scraper's DOM price walk (SURVEY §2 P2/P3,
src/core/tracker/mmk_tracker.py) to the structured channel.

Two native stages, zero Python:

1. **Block pull** — ``regexp_extract_all`` for ld+json script bodies
   (attribute-order tolerant, either quote style), ``posexplode`` to one
   row per block.
2. **Field projection** — ``get_json_object`` JSONPath probes for the
   common schema.org vocabulary. ``author``/``publisher`` may be a plain
   string or a nested object; both spellings coalesce into one column.
   Malformed JSON yields NULL fields, never a stage failure.

Scope: top-level objects (the overwhelmingly common form). ``@graph``
arrays surface as their raw JSON under ``raw`` with NULL projected
fields, so a downstream pass can explode them without re-scanning HTML.

Scale notes: narrow per-row map + data-proportional explode — no
shuffle; the HTML column is touched once and only the (small) JSON
blocks survive into the output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_jsonld"]

# The type attribute may sit anywhere in the tag; body is non-greedy so
# adjacent scripts never merge.
_LDJSON_RE = (
    r'(?is)<script\b[^>]*\btype\s*=\s*["\']application/ld\+json["\'][^>]*>'
    r"(.*?)</script>"
)


def _jpath(block: Column, path: str) -> Column:
    return F.get_json_object(block, path)


def _name_or_string(block: Column, key: str) -> Column:
    """schema.org author/publisher: object with .name, or bare string."""
    nested = _jpath(block, f"$.{key}.name")
    flat = _jpath(block, f"$.{key}")
    # when the value is an object, get_json_object returns its JSON text
    # (starts with '{'); prefer the nested name and never surface raw JSON
    return F.coalesce(
        nested, F.when(~F.coalesce(flat, F.lit("")).startswith("{"), flat)
    )


def extract_jsonld(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """One row per JSON-LD block with the common schema.org projection.

    Output: ``(url, block_idx, jtype, name, headline, item_url,
    date_published, date_modified, author_name, publisher_name, price,
    price_currency, raw)`` — ``block_idx`` is document order, ``jtype``
    the ``@type``, ``price``/``price_currency`` from ``offers`` (Product
    pages), ``raw`` the trimmed block text for downstream re-parsing.
    Blocks that are not JSON objects project NULL fields but keep their
    row (``raw`` preserves the payload).
    """
    blocks = F.regexp_extract_all(F.col(html_col), F.lit(_LDJSON_RE), F.lit(1))
    exploded = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(blocks).alias("block_idx", "b"),
    ).withColumn("b", F.trim("b"))
    b = F.col("b")
    return exploded.select(
        "url",
        "block_idx",
        _jpath(b, "$['@type']").alias("jtype"),
        _jpath(b, "$.name").alias("name"),
        _jpath(b, "$.headline").alias("headline"),
        _jpath(b, "$.url").alias("item_url"),
        _jpath(b, "$.datePublished").alias("date_published"),
        _jpath(b, "$.dateModified").alias("date_modified"),
        _name_or_string(b, "author").alias("author_name"),
        _name_or_string(b, "publisher").alias("publisher_name"),
        F.coalesce(
            _jpath(b, "$.offers.price"), _jpath(b, "$.offers[0].price")
        ).alias("price"),
        F.coalesce(
            _jpath(b, "$.offers.priceCurrency"),
            _jpath(b, "$.offers[0].priceCurrency"),
        ).alias("price_currency"),
        b.alias("raw"),
    )
