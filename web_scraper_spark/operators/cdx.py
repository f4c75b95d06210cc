"""SURT keys and CDX(J) capture indexing — the web-archive lookup path.

Every large crawl ships its WARC output with a CDX index: captures
sorted by SURT key (Sort-friendly URI Reordering Transform — the IA /
Common Crawl convention: lowercase, scheme dropped, host reversed
comma-joined, ``www.`` stripped, query params sorted) so that all
captures of one URL, and one host's URLs, are contiguous and
range-seekable. Common Crawl publishes exactly this shape
(cc-index: SURT, timestamp → WARC filename/offset/length). The
reference scraper stores pages as Mongo documents keyed by site name
and cannot range-scan by URL; this module provides the archive-grade
index over the engine's fetch output.

Spark shapes:

- ``surt_key`` is pure Columns (split / reverse / array_join /
  try_parse_url) — whole-stage codegen, no UDFs;
- ``build_cdx`` globally orders by (surt, ts) via
  ``repartitionByRange`` — Spark's range partitioner samples the key
  distribution, so the sort is cluster-wide parallel, never a
  single-task sort, and the written files are range-disjoint: a
  lookup binary-searches file boundaries, then one file. That is the
  100 TB layout Common Crawl's index uses (300 shards by SURT range).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.urls import url_path, url_query_sorted

__all__ = ["surt_host", "surt_key", "build_cdx"]


def surt_host(host: Column) -> Column:
    """Reversed comma-joined host with a single leading ``www.``
    stripped: ``www.news.example.co.uk`` → ``uk,co,example,news``."""
    h = F.lower(host)
    h = F.when(h.startswith("www."), F.substring(h, 5, 2 ** 20)).otherwise(h)
    return F.array_join(F.reverse(F.split(h, r"\.")), ",")


def surt_key(url: Column) -> Column:
    """Full SURT form ``host-reversed)/path?sorted-query`` (lowercase,
    scheme dropped, default ports already absent from HOST). NULL for
    unparseable URLs — callers route those to the error sink."""
    host = F.try_parse_url(url, F.lit("HOST"))
    q = url_query_sorted(url)
    qpart = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    key = F.concat(
        surt_host(host), F.lit(")"), F.lower(url_path(url)), F.lower(qpart)
    )
    return F.when(host.isNull() | (host == ""), F.lit(None)).otherwise(key)


def build_cdx(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    n_shards: int | None = None,
) -> DataFrame:
    """CDX index rows from capture records: adds ``surt`` and returns
    the frame globally range-ordered by (surt, ts) so a write preserves
    archive lookup order. Pass-through columns (warc file, offset,
    length, digest) ride along untouched. Rows whose URL cannot be
    parsed are dropped (they have no lookup key).

    ``n_shards`` sets the range-partition count (defaults to the
    session shuffle parallelism) — each output shard covers a disjoint
    SURT range, Common-Crawl-index style.
    """
    with_key = captures.withColumn(
        "surt", surt_key(F.col(url_col))
    ).filter(F.col("surt").isNotNull())
    parts = (
        [F.col("surt"), F.col(ts_col)]
        if ts_col in captures.columns
        else [F.col("surt")]
    )
    if n_shards:
        ranged = with_key.repartitionByRange(n_shards, *parts)
    else:
        ranged = with_key.repartitionByRange(*parts)
    return ranged.sortWithinPartitions(*parts)
