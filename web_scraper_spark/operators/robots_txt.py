"""robots.txt parsing as native Column expressions (feeds R9).

The reference has no robots handling (portal crawl behind a login); the
north rule mandates it. ``parse_robots_txt`` turns raw robots.txt text
into the structured rules table that ``operators.politeness.split_robots``
consumes — entirely with built-in functions (split / filter / transform /
regexp), no UDF.

Scope (documented simplification, standard for a * -only crawler):
directives are taken globally for the wildcard agent — every
``Disallow:`` path and the LAST ``Crawl-delay:`` value in the file.
Group-scoped parsing per user-agent is a straightforward extension
(explode lines with positions, propagate the last seen agent with a
window) — not needed while the fleet only honors ``*``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_robots_txt"]


def _lines(txt: Column) -> Column:
    return F.split(txt, r"\r?\n")


def parse_robots_txt(
    df: DataFrame, txt_col: str = "robots_txt", default_crawl_delay: int = 30
) -> DataFrame:
    """(host, robots_txt) → (host, disallow array<string>, crawl_delay_s).

    - ``Disallow:`` values, trimmed; empty values (allow-all) dropped.
    - ``Crawl-delay:`` integer seconds; last occurrence wins; absent →
      ``default_crawl_delay``.
    - directive matching is case-insensitive; inline ``#`` comments are
      stripped.
    """
    lines = _lines(F.col(txt_col))
    # strip inline comments + whitespace per line
    clean = F.transform(
        lines, lambda l: F.trim(F.regexp_replace(l, r"#.*$", ""))
    )
    disallow = F.filter(
        F.transform(
            F.filter(clean, lambda l: F.lower(l).rlike(r"^disallow\s*:")),
            lambda l: F.trim(F.regexp_replace(l, r"(?i)^disallow\s*:", "")),
        ),
        lambda p: p != "",
    )
    delays = F.filter(clean, lambda l: F.lower(l).rlike(r"^crawl-delay\s*:\s*\d+"))
    last_delay = F.try_element_at(  # ANSI-safe on hosts with no delay line
        F.transform(
            delays,
            lambda l: F.regexp_extract(l, r"(?i)^crawl-delay\s*:\s*(\d+)", 1).cast("int"),
        ),
        F.lit(-1),
    )
    return df.select(
        "host",
        disallow.alias("disallow"),
        F.coalesce(last_delay, F.lit(default_crawl_delay)).alias("crawl_delay_s"),
    )
