"""RSS / Atom feed ingestion: parse syndication feeds into dated
frontier candidates.

Feeds are the crawl world's third discovery channel next to outlink
extraction and sitemaps (operators/sitemap.py), and the one that
carries PUBLICATION TIME — the signal the adaptive-revisit scheduler
(operators/revisit.py) otherwise has to estimate from change
observations. A news-class crawl polls feeds at high frequency and
promotes their entries straight into the frontier with depth-1
priority; the reference scraper's listing-poll loop
(src/core/tracker/nausys_tracker.py — fetch listing, diff against
state, schedule detail fetches) is exactly this shape, generalized
here to the two standard web syndication grammars.

Like sitemap XML, feed XML is machine-generated and schema-fixed, so
parsing is native ``regexp_extract_all`` over the body — JVM-side,
codegen'd, no Python — with RE2-compatible patterns so the DuckDB
oracle can construct or run the identical semantics. Both grammars in
one pass:

- **RSS 2.0**: ``<item>`` blocks; ``<title>``, ``<link>`` element
  text, ``<guid>``, ``<pubDate>`` in RFC 822 form
  (``Mon, 02 Jan 2006 15:04:05 GMT``).
- **Atom**: ``<entry>`` blocks; ``<title>``, ``<link href="..."/>``
  attribute form, ``<id>``, ``<updated>`` in RFC 3339/ISO-8601 form.

Scale notes: one narrow per-row map over the feed scan plus an explode
to one row per entry — zero shuffle, output data-proportional. Dates
go through ``try_to_timestamp`` twice (RFC 822 then ISO-8601), NULL on
failure — one sloppy feed must never kill a round. Frontier merge-back
reuses the discoveries anti-join (plans/rounds.py W4) unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "parse_feed_entries",
    "ITEM_BLOCK_RE",
    "ENTRY_BLOCK_RE",
]

# (?s) so a block may span lines; non-greedy so adjacent blocks never
# merge. Identical semantics in Java regex and RE2 (DuckDB).
ITEM_BLOCK_RE = r"(?s)<item>(.*?)</item>"
ENTRY_BLOCK_RE = r"(?s)<entry>(.*?)</entry>"

_TITLE_RE = r"(?s)<title>\s*(.*?)\s*</title>"
_LINK_TEXT_RE = r"(?s)<link>\s*([^<]*?)\s*</link>"
# Atom link: attribute form, href anywhere inside the tag; prefer the
# rel="alternate"-or-unspecified link by matching the FIRST <link tag.
_LINK_HREF_RE = r'(?s)<link\b[^>]*\bhref="([^"]*)"'
_GUID_RE = r"(?s)<guid[^>]*>\s*([^<]*?)\s*</guid>"
_ID_RE = r"(?s)<id>\s*([^<]*?)\s*</id>"
_PUBDATE_RE = r"(?s)<pubDate>\s*([^<]*?)\s*</pubDate>"
_UPDATED_RE = r"(?s)<updated>\s*([^<]*?)\s*</updated>"

# RFC 822 date handling. Spark >= 3 bans day-of-week text ('EEE') and
# zone names ('zzz') in PARSE patterns (DATETIME_PATTERN_RECOGNITION),
# so instead of one SimpleDateFormat-style pattern the weekday prefix is
# stripped (it is redundant in RFC 822) and the named UTC zones
# (GMT/UT/UTC/Z) normalized to a numeric +0000 before try_to_timestamp.
# Numeric offsets (+0300, -0500) pass through to the 'Z' pattern letter;
# other named zones (EST, PDT, ...) are nonstandard in feeds and yield
# NULL rather than a guess. Both second-full and minute-only variants
# are attempted — one sloppy feed must never kill a round.
_RFC822_STRIP_DOW = r"^[A-Za-z]{3},\s*"
_RFC822_UTC_NAMES = r"\s+(GMT|UTC?|UT|Z)\s*$"
_RFC822_FMT_SEC = "d MMM yyyy HH:mm:ss Z"
_RFC822_FMT_MIN = "d MMM yyyy HH:mm Z"
# RFC 3339 as required by Atom; optional milliseconds, 'Z' or ±hh:mm.
_ISO_FMT = "yyyy-MM-dd'T'HH:mm:ssXXX"
_ISO_FMT_MILLIS = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"


def _first(body: Column, pattern: str) -> Column:
    """First captured group, NULL (not '') when the element is absent."""
    ext = F.regexp_extract(body, pattern, 1)
    return F.when(ext != "", ext)


def _rfc822_ts(published: Column) -> Column:
    norm = F.regexp_replace(
        F.regexp_replace(published, _RFC822_STRIP_DOW, ""),
        _RFC822_UTC_NAMES,
        " +0000",
    )
    return F.coalesce(
        F.try_to_timestamp(norm, F.lit(_RFC822_FMT_SEC)),
        F.try_to_timestamp(norm, F.lit(_RFC822_FMT_MIN)),
    )


def _iso_ts(published: Column) -> Column:
    return F.coalesce(
        F.try_to_timestamp(published, F.lit(_ISO_FMT)),
        F.try_to_timestamp(published, F.lit(_ISO_FMT_MILLIS)),
    )


def _entry_struct(block: Column, kind: str) -> Column:
    """Normalize one item/entry block to the common entry schema."""
    if kind == "rss":
        link = _first(block, _LINK_TEXT_RE)
        entry_id = _first(block, _GUID_RE)
        published = _first(block, _PUBDATE_RE)
        published_ts = _rfc822_ts(published)
    else:
        link = _first(block, _LINK_HREF_RE)
        entry_id = _first(block, _ID_RE)
        published = _first(block, _UPDATED_RE)
        published_ts = _iso_ts(published)
    return F.struct(
        F.lit(kind).alias("kind"),
        _first(block, _TITLE_RE).alias("title"),
        link.alias("link"),
        entry_id.alias("entry_id"),
        published.alias("published"),
        published_ts.alias("published_ts"),
    )


def parse_feed_entries(
    feeds: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """Flatten feed documents into one row per item/entry.

    Output: ``(feed_url, kind, entry_idx, title, link, entry_id,
    published, published_ts)`` where ``kind`` is ``'rss'`` for
    ``<item>`` blocks and ``'atom'`` for ``<entry>`` blocks — a
    document contributes whichever blocks it actually contains, so a
    hybrid or mislabeled feed still parses. ``entry_idx`` is the
    0-based document order within the feed (RSS items before Atom
    entries for a hybrid), ``published_ts`` the parsed timestamp
    (RFC 822 for RSS, ISO-8601 for Atom; NULL when absent or
    unparseable).
    """
    body = F.col(body_col)
    blocks = F.concat(
        F.transform(
            F.regexp_extract_all(body, F.lit(ITEM_BLOCK_RE), F.lit(1)),
            lambda b: _entry_struct(b, "rss"),
        ),
        F.transform(
            F.regexp_extract_all(body, F.lit(ENTRY_BLOCK_RE), F.lit(1)),
            lambda b: _entry_struct(b, "atom"),
        ),
    )
    exploded = feeds.select(
        F.col(url_col).alias("feed_url"), F.posexplode(blocks).alias("entry_idx", "e")
    )
    return exploded.select(
        "feed_url",
        F.col("e.kind").alias("kind"),
        "entry_idx",
        F.col("e.title").alias("title"),
        F.col("e.link").alias("link"),
        F.col("e.entry_id").alias("entry_id"),
        F.col("e.published").alias("published"),
        F.col("e.published_ts").alias("published_ts"),
    )
