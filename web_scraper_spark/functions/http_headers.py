"""HTTP caching-header semantics for revisit scheduling.

The reference re-fetches every page unconditionally on every tracker
run (src/core/tracker/nausys_tracker.py fetch loop — no If-Modified-
Since, no Cache-Control inspection). At crawl scale the origin tells
you when a page is worth revisiting, and honoring it is both politeness
and efficiency: a ``max-age`` directive or an ``ETag`` converts a full
fetch into a 304 or skips it entirely.

Pure native-Column parsers (regexp over the raw header string — no
Python UDF), composing with the adaptive revisit scheduler
(operators/revisit.py): ``cache_max_age_s`` provides the origin-
declared floor for the change-rate-driven revisit interval, and
``cache_directives`` gates which URLs may use conditional GETs.

RFC 9111 subset: ``no-store``/``no-cache`` win over ``max-age``;
``s-maxage`` is ignored (we are a private cache for revisit purposes);
a missing/unparsable policy yields NULL max-age (scheduler falls back
to its own estimate).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "cache_max_age_s",
    "cache_directives",
    "next_fetch_after",
    "retry_after_seconds",
    "link_header_entries",
]

_MAX_AGE_RE = r"(?i)(?:^|[,\s])max-age\s*=\s*(\d+)"
_NO_STORE_RE = r"(?i)(?:^|[,\s])no-store(?:$|[,\s])"
_NO_CACHE_RE = r"(?i)(?:^|[,\s])no-cache(?:$|[,\s])"


def cache_max_age_s(cache_control: Column) -> Column:
    """Parsed ``max-age`` seconds, NULL when absent or overridden by
    ``no-store``/``no-cache``."""
    age = F.regexp_extract(cache_control, _MAX_AGE_RE, 1)
    blocked = cache_control.rlike(_NO_STORE_RE) | cache_control.rlike(_NO_CACHE_RE)
    return (
        F.when(blocked | (age == ""), F.lit(None).cast("long"))
        .otherwise(age.cast("long"))
    )


def cache_directives(cache_control: Column) -> Column:
    """Coarse policy class: 'no-store' > 'no-cache' > 'max-age' > 'none'."""
    return (
        F.when(cache_control.rlike(_NO_STORE_RE), F.lit("no-store"))
        .when(cache_control.rlike(_NO_CACHE_RE), F.lit("no-cache"))
        .when(F.regexp_extract(cache_control, _MAX_AGE_RE, 1) != "", F.lit("max-age"))
        .otherwise(F.lit("none"))
    )


def next_fetch_after(
    fetch_ts: Column, cache_control: Column, default_s: int = 86400, cap_s: int = 2592000
) -> Column:
    """Earliest worthwhile refetch timestamp: fetch time + declared
    max-age, clamped to [0, cap]; ``default_s`` when the origin gave no
    usable policy. no-store/no-cache mean "always revalidate" -> 0."""
    age = cache_max_age_s(cache_control)
    policy = cache_directives(cache_control)
    delay = (
        F.when(policy.isin("no-store", "no-cache"), F.lit(0))
        .when(age.isNotNull(), F.least(age, F.lit(cap_s)))
        .otherwise(F.lit(default_s))
    )
    return F.timestamp_add("SECOND", delay.cast("int"), fetch_ts)


# --- RFC 9110 Retry-After -------------------------------------------------
# Retry-After: 120                              (delay-seconds)
# Retry-After: Fri, 31 Dec 1999 23:59:59 GMT    (IMF-fixdate)
# Servers attach it to 429/503 (and 3xx); a crawler that ignores it
# hammers an origin that just asked for mercy — the parsed delay feeds
# the retry/backoff scheduler as a HARD floor over its own estimate.

_RETRY_DELAY_RE = r"^\s*(\d+)\s*$"
# Spark forbids day-of-week symbols in PARSE patterns (SPARK-31892),
# so the IMF-fixdate weekday prefix is stripped first and the rest
# parsed with a weekday-free pattern. Formatting (date_format) may
# still use EEE — the restriction is parse-only.
_IMF_WEEKDAY_PREFIX_RE = r"^\s*[A-Za-z]{3},\s*"
_IMF_DATE_TAIL_FMT = "dd MMM yyyy HH:mm:ss zzz"


def retry_after_seconds(retry_after: Column, now: Column) -> Column:
    """Seconds to wait per a ``Retry-After`` value, relative to ``now``
    (a timestamp column; pass the response's receive time).

    delay-seconds parses directly; an IMF-fixdate parses to
    ``date - now`` clamped at 0 (a past date means "go now", RFC 9110
    §10.2.3 — never negative backoff). The obsolete RFC 850/asctime
    date forms and garbage yield NULL: an unparseable hint must not
    schedule anything, the caller's own backoff estimate applies.
    """
    digits = F.regexp_extract(retry_after, _RETRY_DELAY_RE, 1)
    as_date = F.try_to_timestamp(
        F.regexp_replace(retry_after, _IMF_WEEKDAY_PREFIX_RE, ""),
        F.lit(_IMF_DATE_TAIL_FMT),
    )
    return (
        F.when(digits != "", digits.cast("long"))
        .when(
            as_date.isNotNull(),
            F.greatest(
                F.lit(0).cast("long"),
                (F.unix_timestamp(as_date) - F.unix_timestamp(now)).cast("long"),
            ),
        )
        .cast("long")
    )


# --- RFC 8288 Link header -------------------------------------------------
# Link: </p?page=2>; rel="next", <https://c.example.com/x>; rel=canonical
# One link-value = <target> followed by ;-params; quoted param strings
# are atomic so a comma inside title="a, b" does not split the value.
_LINKVAL_RE = r'<[^>]*>(?:[^,"]|"[^"]*")*'
_LINK_HREF_RE = r"^\s*<([^>]*)>"
_LINK_REL_DQ_RE = r'(?i);\s*rel\s*=\s*"([^"]*)"'
_LINK_REL_TOK_RE = r"(?i);\s*rel\s*=\s*([^;\s\",]+)"


def link_header_entries(link_header: Column) -> Column:
    """``array<struct<href,rel>>`` from a raw ``Link`` header value.

    ``rel`` is a space-separated token list per the RFC; a link-value
    with ``rel="next prefetch"`` contributes one struct per token
    (lowercased). Link-values with no rel param are dropped — the RFC
    makes rel mandatory and consumers key on it. Pure native Columns;
    pairs with operators/headmeta.py so header- and HTML-declared
    rel=next/canonical hints merge into one edge set (the header form
    is how paginated APIs and WordPress sites declare them).
    """
    vals = F.regexp_extract_all(link_header, F.lit(_LINKVAL_RE), F.lit(0))

    def entry(v: Column) -> Column:
        href = F.regexp_extract(v, _LINK_HREF_RE, 1)
        rel_dq = F.regexp_extract(v, _LINK_REL_DQ_RE, 1)
        rel_tok = F.regexp_extract(v, _LINK_REL_TOK_RE, 1)
        rel = F.when(rel_dq != "", rel_dq).when(rel_tok != "", rel_tok)
        return F.transform(
            F.split(F.trim(F.lower(rel)), r"\s+"),
            lambda t: F.struct(href.alias("href"), t.alias("rel")),
        )
    return F.flatten(
        F.filter(F.transform(vals, entry), lambda a: a.isNotNull())
    )
