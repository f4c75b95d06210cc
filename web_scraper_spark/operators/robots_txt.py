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

Matching (RFC 9309 §2.2.2) is implemented by ``compile_rule_patterns``
(pattern compilation ONCE on the small broadcast robots side: ``*`` →
``.*``, trailing ``$`` → end anchor, everything else literal-escaped)
plus ``robots_blocked_expr`` (per-candidate longest-match fold: most
octets wins, Allow beats Disallow on ties, no match → allowed). Plain
prefix rules — the common case — skip the regex engine entirely and
match with ``startswith``. Cross-checked against the pure-Python twin
``oracle/pyrobots.robots_blocked`` by unit + property tests and the
``robots_wildcard`` battery row.

The per-line group resolution is an O(lines²) nested-array expression;
robots files are tens of lines, and keeping it a pure Column means the
parse stays inside whole-stage codegen with no shuffle at any host
count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "parse_robots_txt",
    "compile_rule_patterns",
    "robots_blocked_expr",
    "robots_match_target",
    "robots_sitemaps",
]


def robots_match_target(url: Column) -> Column:
    """RFC 9309 §2.2.2 match target for a URL Column: the path with the
    query string appended (``?`` included), and the empty path of a bare
    ``https://host`` normalized to ``/``. Rules like ``Disallow: /*?``
    or ``Disallow: /search?q=`` only work against this target — matching
    the bare path silently disables every query-bearing rule and lets
    ``Disallow: /`` miss the root URL."""
    path = F.coalesce(
        F.nullif(F.try_parse_url(url, F.lit("PATH")), F.lit("")), F.lit("/")
    )
    q = F.try_parse_url(url, F.lit("QUERY"))
    return F.concat(
        path, F.when(q.isNotNull(), F.concat(F.lit("?"), q)).otherwise(F.lit(""))
    )


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
        return (
            low.rlike(r"^disallow\s*:")
            | low.rlike(r"^allow\s*:")
            | low.rlike(r"^crawl-delay\s*:")
        )

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

    def rule_values(directive: str) -> Column:
        return F.filter(
            F.transform(
                F.filter(
                    F.col("__clean"),
                    lambda s: F.lower(s["l"]).rlike(rf"^{directive}\s*:")
                    & in_scope(s["i"]),
                ),
                lambda s: F.trim(
                    F.regexp_replace(s["l"], rf"(?i)^{directive}\s*:", "")
                ),
            ),
            lambda p: p != "",
        )

    disallow = rule_values("disallow")
    allow = rule_values("allow")
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
        allow.alias("allow"),
        F.coalesce(last_delay, F.lit(default_crawl_delay)).alias("crawl_delay_s"),
    )


def compile_rule_patterns(robots: DataFrame) -> DataFrame:
    """Pre-compile Allow/Disallow values into a ``rules`` match table —
    computed ONCE on the (small, broadcast-bound) robots side so the
    per-candidate row pays only the match, never pattern construction.

    RFC 9309 §2.2.2 matching: ``*`` matches any character run, a
    TRAILING ``$`` anchors the rule to the path end (a mid-rule ``$``
    is literal — the convention every major parser shares), everything
    else is literal. Rules with neither wildcard keep ``plain=true`` and
    match with ``startswith`` (no regex engine on the hot path for the
    overwhelmingly-common prefix rules).

    Output adds ``rules array<struct<raw, pat, spec, is_allow, plain>>``
    where ``spec`` = octet length of the raw rule (the RFC's
    most-specific-match key) and ties break toward ``is_allow`` = 1.
    """
    cols = robots.columns
    allow_col = (
        F.col("allow")
        if "allow" in cols
        else F.array().cast("array<string>")
    )

    def rule_struct(raw: Column, is_allow: int) -> Column:
        anchored = raw.endswith("$")
        body = F.when(
            anchored, raw.substr(F.lit(1), F.length(raw) - 1)
        ).otherwise(raw)
        esc = F.regexp_replace(body, r"([.^$+?(){}\[\]|\\])", r"\\$1")
        pat = F.concat(
            F.lit("^"),
            F.replace(esc, F.lit("*"), F.lit(".*")),
            F.when(anchored, F.lit("$")).otherwise(F.lit("")),
        )
        return F.struct(
            raw.alias("raw"),
            pat.alias("pat"),
            # RFC 9309 longest-match specificity counts OCTETS, not
            # characters — non-ASCII rules must win ties by byte length
            F.octet_length(raw).alias("spec"),
            F.lit(is_allow).alias("is_allow"),
            (~raw.contains("*") & ~anchored).alias("plain"),
        )

    rules = F.concat(
        F.transform(
            F.coalesce(F.col("disallow"), F.array().cast("array<string>")),
            lambda p: rule_struct(p, 0),
        ),
        F.transform(
            F.coalesce(allow_col, F.array().cast("array<string>")),
            lambda p: rule_struct(p, 1),
        ),
    )
    keep = [c for c in cols if c not in ("disallow", "allow")]
    return robots.select(*keep, rules.alias("rules"))


def robots_blocked_expr(path: Column, rules: Column) -> Column:
    """RFC 9309 decision over a pre-compiled ``rules`` array: the
    most-specific (longest) matching rule wins; Allow wins specificity
    ties; no match → allowed. NULL rules (host absent from the robots
    table) → allowed. Pure Column fold — no UDF, no explode."""
    matched = F.filter(
        rules,
        lambda r: F.when(r["plain"], path.startswith(r["raw"])).otherwise(
            F.rlike(path, r["pat"])
        ),
    )
    best = F.aggregate(
        matched,
        F.struct(
            F.lit(-1).alias("spec"), F.lit(1).alias("is_allow")
        ),
        lambda acc, x: F.when(
            (x["spec"] > acc["spec"])
            | ((x["spec"] == acc["spec"]) & (x["is_allow"] > acc["is_allow"])),
            F.struct(x["spec"].alias("spec"), x["is_allow"].alias("is_allow")),
        ).otherwise(acc),
    )
    return F.when(rules.isNull(), F.lit(False)).otherwise(
        (best["spec"] >= 0) & (best["is_allow"] == 0)
    )


def robots_sitemaps(
    df: DataFrame, txt_col: str = "robots_txt", host_col: str = "host"
) -> DataFrame:
    """Extract ``Sitemap:`` records → ``(host, sitemap_url)``.

    Per RFC 9309 §2.3 / sitemaps.org, ``Sitemap`` lines are
    group-INDEPENDENT records: they apply regardless of any
    ``User-agent`` group they appear inside, so extraction ignores
    group scoping entirely (unlike Allow/Disallow above). Matching is
    case-insensitive, inline ``#`` comments are stripped, and values
    must be absolute http(s) URLs (the sitemaps.org contract — a
    relative value is a publisher bug and is dropped rather than
    guessed at).

    The output feeds ``operators/sitemap.py`` ingestion: discovered
    sitemap URLs enter the frontier like any other fetch task. Pure
    Columns — one in-row transform chain, explode only the (few)
    matched lines; the robots table is hosts-sized, never page-sized.
    """
    clean = F.transform(
        _lines(F.col(txt_col)),
        lambda l: F.trim(F.regexp_replace(l, r"#.*$", "")),
    )
    urls = F.filter(
        F.transform(
            F.filter(clean, lambda l: F.lower(l).rlike(r"^sitemap\s*:")),
            lambda l: F.trim(F.regexp_replace(l, r"(?i)^sitemap\s*:", "")),
        ),
        lambda u: u.rlike(r"^https?://"),
    )
    return df.select(
        F.col(host_col).alias("host"), F.explode(urls).alias("sitemap_url")
    ).distinct()
