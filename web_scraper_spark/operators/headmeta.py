"""HTML head-metadata extraction: canonical, hreflang, OpenGraph,
meta-robots, and feed autodiscovery from the document ``<head>``.

This is the metadata layer a webtext pipeline keys on between fetch and
corpus assembly: ``rel=canonical`` feeds the canonical-collapse operator
(operators/redirects.py:collapse_canonical), ``hreflang`` clusters
translations so language-ID disagreements can be cross-checked,
``meta robots`` gates indexing the way robots.txt gates fetching
(operators/robots_txt.py handles the transport layer; this handles the
per-document layer), OpenGraph carries the page's self-declared
title/type/image, and ``rel=alternate type=application/rss+xml`` is feed
autodiscovery — the entry point into operators/feeds.py. The reference
scraper reads per-page DOM fields imperatively (SURVEY §2 P1,
src/core/tracker/nausys_tracker.py detail extraction); this generalizes
that shape to the standard head vocabulary.

Head HTML is machine-written and attribute-ordered arbitrarily, so
extraction is two-level native regex — ``regexp_extract_all`` pulls
whole ``<link>``/``<meta>`` tags, then per-tag attribute extraction
tolerates any attribute order and either quote style. Everything is
JVM-side Column expressions (codegen'd, zero Python, zero shuffle); one
narrow pass over the page scan, output one row per page. Values are
taken raw (no entity decoding) — entity-bearing titles are rare in the
head vocabulary and a decode pass belongs to the content extractor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_head_meta"]

# Everything up to </head>; a page with no </head> contributes its whole
# body (head-less fragments still often carry meta tags up top).
_HEAD_RE = r"(?is)^(.*?)</head>"
_TAG_LINK_RE = r"(?is)<link\b[^>]*>"
_TAG_META_RE = r"(?is)<meta\b[^>]*>"
_TITLE_RE = r"(?is)<title[^>]*>\s*(.*?)\s*</title>"
_HTML_LANG_RE = r'(?is)<html\b[^>]*\blang\s*=\s*["\']?([A-Za-z0-9-]+)'
_BASE_RE = r'(?is)<base\b[^>]*\bhref\s*=\s*["\']([^"\']*)'


def _attr(tag: Column, name: str) -> Column:
    """Attribute value from a single tag, either quote style, NULL when
    absent. Case-insensitive attribute names (HTML is)."""
    dq = F.regexp_extract(tag, rf'(?i)\b{name}\s*=\s*"([^"]*)"', 1)
    sq = F.regexp_extract(tag, rf"(?i)\b{name}\s*=\s*'([^']*)'", 1)
    uq = F.regexp_extract(tag, rf"(?i)\b{name}\s*=\s*([^\s\"'>]+)", 1)
    return F.when(dq != "", dq).when(sq != "", sq).when(uq != "", uq)


def _first_nonnull(arr: Column) -> Column:
    compact = F.filter(arr, lambda x: x.isNotNull())
    return F.when(F.size(compact) > 0, F.element_at(compact, 1))


def parse_head_meta(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """One row per page with the standard head-metadata vocabulary.

    Output columns (beyond ``url``):

    - ``title`` — ``<title>`` text, whitespace-trimmed, NULL if absent.
    - ``lang`` — ``<html lang=...>`` attribute.
    - ``base_href`` — ``<base href=...>``.
    - ``canonical`` — first ``<link rel="canonical">`` href (first wins,
      matching browser/search-engine behavior on conflicting hints).
    - ``next_href``/``prev_href`` — pagination hints from
      ``<link rel="next"/"prev">`` (``previous`` accepted as an alias);
      the edges operators/pagination.py reconstructs chains from.
    - ``meta_description`` — ``<meta name="description">`` content.
    - ``og_title``/``og_type``/``og_url``/``og_image`` — OpenGraph
      ``<meta property="og:*">`` content (first of each).
    - ``robots_noindex``/``robots_nofollow`` — token-wise flags from
      ``<meta name="robots">`` content (``none`` implies both, per the
      de-facto standard).
    - ``hreflang`` — array of ``struct(lang, href)`` from
      ``<link rel="alternate" hreflang=...>``, sorted by lang.
    - ``feed_hrefs`` — array of hrefs from feed autodiscovery links
      (``rel=alternate`` with an RSS/Atom MIME type), sorted.

    Rel matching is token-wise and case-insensitive (``rel`` is a
    space-separated token list per the HTML spec).
    """
    body = F.col(html_col)
    head_ext = F.regexp_extract(body, _HEAD_RE, 1)
    head = F.when(head_ext != "", head_ext).otherwise(body)

    links = F.regexp_extract_all(head, F.lit(_TAG_LINK_RE), F.lit(0))
    metas = F.regexp_extract_all(head, F.lit(_TAG_META_RE), F.lit(0))

    def rel_has(tag: Column, token: str) -> Column:
        rel = F.coalesce(_attr(tag, "rel"), F.lit(""))
        return F.array_contains(
            F.split(F.trim(F.lower(rel)), r"\s+"), token
        )

    def meta_content(key_attr: str, key_val: str) -> Column:
        return _first_nonnull(
            F.transform(
                metas,
                lambda t: F.when(
                    F.lower(_attr(t, key_attr)) == key_val.lower(),
                    _attr(t, "content"),
                ),
            )
        )

    canonical = _first_nonnull(
        F.transform(
            links, lambda t: F.when(rel_has(t, "canonical"), _attr(t, "href"))
        )
    )
    next_href = _first_nonnull(
        F.transform(links, lambda t: F.when(rel_has(t, "next"), _attr(t, "href")))
    )
    prev_href = _first_nonnull(
        F.transform(
            links,
            lambda t: F.when(
                rel_has(t, "prev") | rel_has(t, "previous"), _attr(t, "href")
            ),
        )
    )
    hreflang = F.array_sort(
        F.filter(
            F.transform(
                links,
                lambda t: F.when(
                    rel_has(t, "alternate") & _attr(t, "hreflang").isNotNull(),
                    F.struct(
                        F.lower(_attr(t, "hreflang")).alias("lang"),
                        _attr(t, "href").alias("href"),
                    ),
                ),
            ),
            lambda s: s.isNotNull() & s["href"].isNotNull(),
        )
    )
    feed_hrefs = F.array_sort(
        F.filter(
            F.transform(
                links,
                lambda t: F.when(
                    rel_has(t, "alternate")
                    & F.lower(F.coalesce(_attr(t, "type"), F.lit(""))).rlike(
                        r"application/(rss|atom)\+xml"
                    ),
                    _attr(t, "href"),
                ),
            ),
            lambda h: h.isNotNull(),
        )
    )
    robots = F.split(
        F.trim(F.lower(F.coalesce(meta_content("name", "robots"), F.lit("")))),
        r"\s*,\s*",
    )
    noindex = F.array_contains(robots, "noindex") | F.array_contains(robots, "none")
    nofollow = F.array_contains(robots, "nofollow") | F.array_contains(robots, "none")

    title_ext = F.regexp_extract(head, _TITLE_RE, 1)
    lang_ext = F.regexp_extract(head, _HTML_LANG_RE, 1)
    base_ext = F.regexp_extract(head, _BASE_RE, 1)

    return pages.select(
        F.col(url_col).alias("url"),
        F.when(title_ext != "", title_ext).alias("title"),
        F.when(lang_ext != "", F.lower(lang_ext)).alias("lang"),
        F.when(base_ext != "", base_ext).alias("base_href"),
        canonical.alias("canonical"),
        next_href.alias("next_href"),
        prev_href.alias("prev_href"),
        meta_content("name", "description").alias("meta_description"),
        meta_content("property", "og:title").alias("og_title"),
        meta_content("property", "og:type").alias("og_type"),
        meta_content("property", "og:url").alias("og_url"),
        meta_content("property", "og:image").alias("og_image"),
        noindex.alias("robots_noindex"),
        nofollow.alias("robots_nofollow"),
        hreflang.alias("hreflang"),
        feed_hrefs.alias("feed_hrefs"),
    )
