"""robots.txt parsing as native Column expressions (feeds R9).

The reference has no robots handling (portal crawl behind a login); the
north rule mandates it. ``parse_robots_txt`` turns raw robots.txt text
into the structured rules table that ``operators.politeness.split_robots``
consumes — entirely with built-in functions (split / filter / transform /
exists / regexp), no UDF, no explode: one narrow projection per host.

Group scoping (RFC 9309 semantics, the parts a * / named-agent fleet
needs):

- ``User-agent:`` lines open a group; several consecutive agent lines
  share the directives that follow them.
- A directive (Disallow / Crawl-delay) belongs to agent A iff A's line
  precedes it with no other directive in between — i.e. A is part of
  the directive's immediately-preceding agent run.
- If any group names ``user_agent`` (case-insensitive exact match),
  ONLY those groups apply; otherwise the ``*`` groups apply — a named
  agent never also inherits ``*`` rules (RFC 9309 §2.2.1).

The per-line group resolution is an O(lines²) nested-array expression;
robots files are tens of lines, and keeping it a pure Column means the
parse stays inside whole-stage codegen with no shuffle at any host
count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_robots_txt"]


def _lines(txt: Column) -> Column:
    return F.split(txt, r"\r?\n")


def parse_robots_txt(
    df: DataFrame,
    txt_col: str = "robots_txt",
    default_crawl_delay: int = 30,
    user_agent: str = "*",
) -> DataFrame:
    """(host, robots_txt) → (host, disallow array<string>, crawl_delay_s)
    for the groups that apply to ``user_agent``.

    - ``Disallow:`` values, trimmed; empty values (allow-all) dropped.
    - ``Crawl-delay:`` integer seconds; last in-scope occurrence wins;
      absent → ``default_crawl_delay``.
    - directive matching is case-insensitive; inline ``#`` comments are
      stripped.
    """
    lines = _lines(F.col(txt_col))
    # strip inline comments + whitespace, keep (1-based position, text)
    clean = F.transform(
        lines, lambda l, i: F.struct((i + 1).alias("i"), F.trim(F.regexp_replace(l, r"#.*$", "")).alias("l"))
    )
    out = df.withColumn("__clean", clean)

    def is_dir(l: Column) -> Column:
        low = F.lower(l)
        return low.rlike(r"^disallow\s*:") | low.rlike(r"^crawl-delay\s*:")

    # positions of every directive line (group boundaries for the
    # "no directive between agent line and this one" test); agent lines
    # matching the requested agent vs the wildcard, by position
    out = (
        out.withColumn(
            "__dirs",
            F.transform(
                F.filter(F.col("__clean"), lambda s: is_dir(s["l"])), lambda s: s["i"]
            ),
        )
        .withColumn(
            "__agents",
            F.transform(
                F.filter(
                    F.col("__clean"),
                    lambda s: F.lower(s["l"]).rlike(r"^user-agent\s*:"),
                ),
                lambda s: F.struct(
                    s["i"].alias("i"),
                    F.lower(
                        F.trim(F.regexp_replace(s["l"], r"(?i)^user-agent\s*:", ""))
                    ).alias("agent"),
                ),
            ),
        )
        .withColumn(
            "__named",
            F.filter(F.col("__agents"), lambda a: a["agent"] == F.lit(user_agent.lower())),
        )
        .withColumn(
            "__chosen",
            F.when(F.size("__named") > 0, F.col("__named")).otherwise(
                F.filter(F.col("__agents"), lambda a: a["agent"] == "*")
            ),
        )
    )

    def in_scope(i: Column) -> Column:
        # directive at position i applies to chosen agent a iff a's line
        # precedes it and no NEW group opened in between — i.e. no agent
        # line b between a and i that itself follows a directive since a
        # (an agent line directly after a is part of a's shared run)
        return F.exists(
            F.col("__chosen"),
            lambda a: (a["i"] < i)
            & ~F.exists(
                F.col("__agents"),
                lambda b: (b["i"] > a["i"])
                & (b["i"] < i)
                & F.exists(
                    F.col("__dirs"), lambda d: (d > a["i"]) & (d < b["i"])
                ),
            ),
        )

    disallow = F.filter(
        F.transform(
            F.filter(
                F.col("__clean"),
                lambda s: F.lower(s["l"]).rlike(r"^disallow\s*:") & in_scope(s["i"]),
            ),
            lambda s: F.trim(F.regexp_replace(s["l"], r"(?i)^disallow\s*:", "")),
        ),
        lambda p: p != "",
    )
    delays = F.filter(
        F.col("__clean"),
        lambda s: F.lower(s["l"]).rlike(r"^crawl-delay\s*:\s*\d+") & in_scope(s["i"]),
    )
    last_delay = F.try_element_at(  # ANSI-safe on hosts with no delay line
        F.transform(
            delays,
            lambda s: F.regexp_extract(
                s["l"], r"(?i)^crawl-delay\s*:\s*(\d+)", 1
            ).cast("int"),
        ),
        F.lit(-1),
    )
    return out.select(
        "host",
        disallow.alias("disallow"),
        F.coalesce(last_delay, F.lit(default_crawl_delay)).alias("crawl_delay_s"),
    )
