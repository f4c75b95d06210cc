"""Sitemap ingestion: parse sitemap.xml / sitemap-index documents into
frontier candidates.

Sitemaps (sitemaps.org protocol) are the crawl world's second discovery
channel next to outlink extraction: ``<urlset>`` documents list page
URLs (optionally with ``<lastmod>``), ``<sitemapindex>`` documents list
child sitemaps. Sitemap XML is machine-generated and schema-fixed, so
parsing is native ``regexp_extract_all`` over the body — JVM-side,
codegen'd, no Python — with RE2-compatible patterns so the DuckDB
oracle runs the identical pattern text.

Scale notes: parsing is a narrow per-row map over the sitemap scan
(zero shuffle); the explode fans out to one row per ``<url>`` block,
i.e. output is data-proportional. Dedup/merge into the frontier reuses
the same ``(url_hash, url)`` anti-join as outlink discoveries
(plans/rounds.py W4) — sitemap entries are just discoveries with a
``lastmod`` hint and depth 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import canonicalize_url, host_bucket, url_hash
from .priority import (
    DISCOVERED_PERIOD_IDX,
    DISCOVERED_SEED_RANK,
    DISCOVERED_YACHT_RANK,
)

__all__ = [
    "parse_sitemap_entries",
    "sitemap_frontier_entries",
    "changefreq_revisit_days",
    "URL_BLOCK_RE",
    "SITEMAP_BLOCK_RE",
    "LOC_RE",
    "LASTMOD_RE",
    "CHANGEFREQ_RE",
    "PRIORITY_RE",
    "CHANGEFREQ_TOKENS",
]

# (?s) so a block may span lines; non-greedy so adjacent blocks never
# merge. Identical semantics in Java regex and RE2 (DuckDB).
URL_BLOCK_RE = r"(?s)<url>(.*?)</url>"
SITEMAP_BLOCK_RE = r"(?s)<sitemap>(.*?)</sitemap>"
LOC_RE = r"(?s)<loc>\s*([^<]*?)\s*</loc>"
LASTMOD_RE = r"(?s)<lastmod>\s*([^<]*?)\s*</lastmod>"
CHANGEFREQ_RE = r"(?s)<changefreq>\s*([^<]*?)\s*</changefreq>"
PRIORITY_RE = r"(?s)<priority>\s*([^<]*?)\s*</priority>"

# sitemaps.org <changefreq> vocabulary; anything else is publisher
# garbage and parses to NULL rather than a guess
CHANGEFREQ_TOKENS = (
    "always", "hourly", "daily", "weekly", "monthly", "yearly", "never",
)


def parse_sitemap_entries(
    sitemaps: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """Flatten sitemap documents into (sitemap_url, kind, loc, lastmod)
    rows.

    ``kind`` is ``'url'`` for page entries (``<urlset>`` children) and
    ``'sitemap'`` for child sitemaps (``<sitemapindex>`` children) —
    a document contributes whichever blocks it actually contains, so a
    malformed hybrid still parses. ``lastmod`` is the raw W3C datetime
    string (NULL when absent); ``lastmod_date`` is its ``try_cast`` to
    date (NULL when unparseable — one bad value must not kill a round).
    Entries with an empty ``<loc>`` are dropped.

    The optional sitemaps.org hint fields ride along: ``changefreq``
    (trimmed + lowercased, NULL unless one of the seven spec tokens)
    and ``priority`` (``try_cast`` to double, NULL when absent,
    unparseable, or outside the spec's [0.0, 1.0] range — crawlers
    must not let a publisher bid priority 9000). Both are NULL on
    ``kind='sitemap'`` rows (the spec defines them for page entries
    only).
    """
    body = F.col(body_col)
    blocks = F.concat(
        F.transform(
            F.regexp_extract_all(body, F.lit(URL_BLOCK_RE), 1),
            lambda b: F.struct(F.lit("url").alias("kind"), b.alias("block")),
        ),
        F.transform(
            F.regexp_extract_all(body, F.lit(SITEMAP_BLOCK_RE), 1),
            lambda b: F.struct(F.lit("sitemap").alias("kind"), b.alias("block")),
        ),
    )
    is_url = F.col("e.kind") == "url"
    cf_raw = F.lower(
        F.trim(F.regexp_extract(F.col("e.block"), CHANGEFREQ_RE, 1))
    )
    pr_raw = F.regexp_extract(F.col("e.block"), PRIORITY_RE, 1).try_cast(
        "double"
    )
    exploded = sitemaps.select(
        F.col(url_col).alias("sitemap_url"), F.explode(blocks).alias("e")
    ).select(
        "sitemap_url",
        F.col("e.kind").alias("kind"),
        F.regexp_extract(F.col("e.block"), LOC_RE, 1).alias("loc"),
        F.when(
            F.regexp_extract(F.col("e.block"), LASTMOD_RE, 1) != "",
            F.regexp_extract(F.col("e.block"), LASTMOD_RE, 1),
        ).alias("lastmod"),
        F.when(is_url & cf_raw.isin(*CHANGEFREQ_TOKENS), cf_raw).alias(
            "changefreq"
        ),
        F.when(
            is_url & (pr_raw >= 0.0) & (pr_raw <= 1.0), pr_raw
        ).alias("priority"),
    )
    return exploded.filter(F.col("loc") != "").withColumn(
        "lastmod_date", F.substring("lastmod", 1, 10).try_cast("date")
    )


def changefreq_revisit_days(changefreq) -> "F.Column":
    """Map a validated ``changefreq`` token to a revisit interval in
    days for the adaptive re-crawl scheduler (operators/revisit.py):
    sub-daily tokens mean "check every round" (0), ``never`` means no
    hint-driven revisit (NULL — the change-rate MLE still applies; a
    publisher's 'never' is a prior, not a promise), and unknown/NULL
    tokens yield NULL so garbage hints never schedule anything."""
    c = changefreq if not isinstance(changefreq, str) else F.col(changefreq)
    return (
        F.when(c.isin("always", "hourly"), F.lit(0))
        .when(c == "daily", F.lit(1))
        .when(c == "weekly", F.lit(7))
        .when(c == "monthly", F.lit(30))
        .when(c == "yearly", F.lit(365))
        .cast("int")
    )


def sitemap_frontier_entries(
    entries: DataFrame,
    seeds: DataFrame | None = None,
    n_buckets: int = 16,
    round_id: int = 0,
) -> DataFrame:
    """Turn parsed page entries (kind='url') into FRONTIER_COLS-shaped
    discovery rows at depth 1, exactly like outlink discoveries
    (plans/rounds.py:552): canonicalized, hashed, host-bucketed,
    seed-rank inherited from the seed list when the host is a seed host.
    The caller merges them with the same ``(url_hash, url)`` anti-join
    W4 uses — sitemap discovery needs no new merge machinery."""
    page_urls = (
        entries.filter(F.col("kind") == "url")
        .withColumn("url", canonicalize_url(F.col("loc")))
        .filter(F.col("url").isNotNull())
        .withColumn("host", F.lower(F.try_parse_url(F.col("url"), F.lit("HOST"))))
        .groupBy("url", "host")
        .agg(F.lit(1).alias("depth"))
    )
    if seeds is not None:
        seed_ranks = seeds.select(
            F.col("host").alias("d_host"), F.col("seed_rank").alias("d_seed_rank")
        )
        page_urls = page_urls.join(
            F.broadcast(seed_ranks), F.col("host") == F.col("d_host"), "left"
        )
    else:
        page_urls = page_urls.withColumn(
            "d_seed_rank", F.lit(None).cast("int")
        )
    return page_urls.select(
        "url",
        url_hash(F.col("url")).alias("url_hash"),
        "host",
        host_bucket(F.col("host"), n_buckets).alias("host_bucket"),
        "depth",
        F.lit(round_id).alias("discovery_round"),
        F.coalesce("d_seed_rank", F.lit(DISCOVERED_SEED_RANK)).alias("seed_rank"),
        F.lit(DISCOVERED_YACHT_RANK).alias("yacht_rank"),
        F.lit(DISCOVERED_PERIOD_IDX).alias("period_idx"),
        F.lit("").alias("competitor"),
        F.lit("").alias("yacht_id"),
        F.lit("").alias("period_from"),
        F.lit("").alias("period_to"),
        F.lit("pending").alias("state"),
        F.lit(0).alias("attempts"),
        F.lit(0).alias("not_before"),
    )
