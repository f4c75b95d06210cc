"""DUST rule mining — Different URLs with Similar Text.

Web servers expose the same document under many URL spellings
(``www.`` prefixes, ``?utm_*`` tracking params, ``/index.html``
suffixes, print views). A crawler that learns these *rewrite rules*
de-duplicates the frontier BEFORE fetching — the classic result is
Bar-Yossef, Keidar & Schonfeld, "Do Not Crawl in the DUST" (WWW'07):
mine substring-substitution rules α→β from pairs of URLs already known
to carry the same content, rank by support, and apply them to unseen
URLs. The reference scraper (deha388/web-scraper) hardcodes one URL
template per site (config.py competitor dict) and cannot learn alias
structure; this operator generalizes that to web scale.

Spark shapes (all built-in Columns, no UDFs):

- **pair generation is linear, never quadratic**: URLs are grouped by
  content fingerprint and paired ADJACENT-IN-SORTED-ORDER within each
  group (``lag`` over a ``partitionBy(fingerprint)`` window) — a
  cluster of k aliases yields k-1 pairs, not k·(k-1)/2, so a viral
  page mirrored 10^5 times cannot quadratic-bomb a task. The shuffle
  carries only (fingerprint, url).
- **rule factoring is per-row**: the longest common prefix/suffix of a
  pair is computed with ``zip_with`` over char arrays +
  ``array_position`` (first mismatch index) — one pass per URL pair,
  JVM codegen, no Python.
- **support counting** is one hash aggregate over (α, β).

At 100 TB the fingerprint column already exists (exact-dedup hash from
operators/dedup.py); mining is two narrow shuffles end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["same_content_pairs", "factor_pair", "mine_dust_rules"]


def _first_mismatch(a: Column, b: Column) -> Column:
    """Length of the longest common prefix of two strings.

    ``zip_with`` pads the shorter char array with NULL, so elementwise
    ``x = y`` yields true / false / NULL(past end); the first ``false``
    is the first real mismatch. ``array_position`` skips NULLs and
    returns 0 when no mismatch exists — i.e. one string is a prefix of
    the other — in which case the LCP is the shorter length.
    """
    eq = F.zip_with(
        F.split(a, ""), F.split(b, ""), lambda x, y: x == y
    )
    pos = F.array_position(eq, F.lit(False))
    shorter = F.least(F.length(a), F.length(b))
    return F.when(pos == 0, shorter).otherwise(pos - 1)


def same_content_pairs(
    pages: DataFrame,
    fingerprint_col: str = "content_hash",
    url_col: str = "url",
) -> DataFrame:
    """(url_a, url_b) pairs of distinct URLs sharing a content
    fingerprint — adjacent in sorted order per fingerprint group
    (k-1 pairs per k-alias cluster; see module docstring)."""
    w = Window.partitionBy(fingerprint_col).orderBy(url_col)
    return (
        pages.select(fingerprint_col, url_col)
        .distinct()
        .withColumn("__prev", F.lag(url_col).over(w))
        .filter(F.col("__prev").isNotNull())
        .select(
            F.col("__prev").alias("url_a"),
            F.col(url_col).alias("url_b"),
        )
    )


def factor_pair(pairs: DataFrame) -> DataFrame:
    """Factor each (url_a, url_b) into (prefix, α, β, suffix) with
    url_a = prefix·α·suffix and url_b = prefix·β·suffix, prefix/suffix
    maximal (suffix clamped so the spans never overlap: the suffix may
    not reach left of the prefix end on the shorter string). The
    substitution candidate is α→β."""
    a, b = F.col("url_a"), F.col("url_b")
    lcp = _first_mismatch(a, b)
    raw_lcs = _first_mismatch(F.reverse(a), F.reverse(b))
    min_len = F.least(F.length(a), F.length(b))
    lcs = F.least(raw_lcs, min_len - lcp)
    return pairs.select(
        "url_a",
        "url_b",
        a.substr(lcp + 1, F.length(a) - lcp - lcs).alias("alpha"),
        b.substr(lcp + 1, F.length(b) - lcp - lcs).alias("beta"),
    )


def mine_dust_rules(
    pages: DataFrame,
    fingerprint_col: str = "content_hash",
    url_col: str = "url",
    min_support: int = 2,
) -> DataFrame:
    """End-to-end DUST mining: same-content pairs → per-pair α/β
    factoring → support count per rule. Returns (alpha, beta, support)
    for rules with support ≥ ``min_support``, highest-support first.

    α and β are ordered by the lexicographic order of the full URLs
    (url_a < url_b), so a rule and its inverse collapse to one row.
    """
    factored = factor_pair(
        same_content_pairs(pages, fingerprint_col, url_col)
    )
    return (
        factored.filter(F.col("alpha") != F.col("beta"))
        .groupBy("alpha", "beta")
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
        .orderBy(F.desc("support"), "alpha", "beta")
    )
