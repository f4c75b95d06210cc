"""URL canonicalization + identity — pure Column expressions.

The reference crawler fetches fixed config URLs and has no canonicalizer;
the north rule mandates one (lowercase host, strip fragments / default
ports, sort query params) feeding an ``xxhash64`` URL identity. Everything
here is built from native ``pyspark.sql.functions`` (``parse_url``,
``regexp_extract``, ``array_sort`` …) so it stays inside whole-stage
codegen — no UDFs.

Canonical form (the spec; the pure-Python twin in
``web_scraper_spark.oracle.pyurl`` implements the same rules for the
sequential oracle):

- scheme: lowercased; URLs without a parseable scheme+host → NULL.
- userinfo: dropped (no credentials in the canonical identity).
- host: lowercased.
- port: dropped when it is the scheme default (http:80, https:443),
  kept otherwise.
- path: kept byte-for-byte, except empty path → "/".
- query: split on "&", empty params dropped, params sorted
  lexicographically (byte order), re-joined with "&"; an empty query
  drops the "?".
- fragment: dropped.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "url_scheme",
    "url_host",
    "url_port",
    "url_path",
    "url_query_sorted",
    "canonicalize_url",
    "url_hash",
    "host_bucket",
    "classify_url",
]

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def url_scheme(url: Column) -> Column:
    return F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))


def url_host(url: Column) -> Column:
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def url_port(url: Column) -> Column:
    """Explicit port as a string, '' when absent (from AUTHORITY)."""
    auth = F.try_parse_url(url, F.lit("AUTHORITY"))
    return F.regexp_extract(auth, r":(\d+)$", 1)


def url_path(url: Column) -> Column:
    path = F.try_parse_url(url, F.lit("PATH"))
    return F.when((path.isNull()) | (path == ""), F.lit("/")).otherwise(path)


def url_query_sorted(url: Column) -> Column:
    """Query string with params sorted, '' when no non-empty params."""
    q = F.try_parse_url(url, F.lit("QUERY"))
    parts = F.filter(F.split(F.coalesce(q, F.lit("")), "&"), lambda p: p != "")
    return F.array_join(F.array_sort(parts), "&")


def canonicalize_url(url: Column) -> Column:
    """Canonical URL string (NULL for unparseable input)."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = url_port(url)
    # Drop scheme-default ports; keep any other explicit port.
    is_default = (
        ((scheme == "http") & (port == _DEFAULT_PORTS["http"]))
        | ((scheme == "https") & (port == _DEFAULT_PORTS["https"]))
        | (port == "")
    )
    port_part = F.when(is_default, F.lit("")).otherwise(F.concat(F.lit(":"), port))
    query = url_query_sorted(url)
    query_part = F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query))
    canon = F.concat(scheme, F.lit("://"), host, port_part, url_path(url), query_part)
    return F.when(scheme.isNull() | host.isNull() | (host == ""), F.lit(None)).otherwise(
        canon
    )


def url_hash(url_canon: Column) -> Column:
    """64-bit URL identity over the canonical form (JVM xxhash64)."""
    return F.xxhash64(url_canon)


def host_bucket(host: Column, num_buckets: int = 1024) -> Column:
    """Stable host bucket for partitioning / politeness grouping.

    ``pmod(xxhash64(host), P)`` — the frontier and fetch stages repartition
    on this so one hot host cannot pin a single task (see
    operators.politeness for the salting story).
    """
    return F.pmod(F.xxhash64(host), F.lit(num_buckets)).cast("int")


def classify_url(url: Column) -> Column:
    """Coarse page-type class from URL shape alone — the pre-fetch
    signal a frontier scheduler uses to prioritize (detail pages over
    pagination churn) and to skip non-HTML assets without spending a
    request. The reference hard-codes this knowledge in its per-site
    templates (src/core/tracker/*_tracker.py builds search vs detail
    URLs from constants); at corpus scale it must be derived from the
    URL itself. Pure Column CASE over rlike — no Python, pushes into
    whole-stage codegen.

    Classes, first match wins:
    - 'asset'      — static file extensions (images/css/js/fonts/media)
    - 'search'     — a query string carrying q=/search=/keyword=
    - 'pagination' — page=N params or /page/N path steps
    - 'detail'     — a long numeric id (>=4 digits) in the last path step
    - 'listing'    — everything else
    """
    path = F.lower(url_path(url))
    query = F.lower(F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit("")))
    return (
        F.when(
            path.rlike(
                r"\.(png|jpe?g|gif|webp|svg|ico|css|js|woff2?|ttf|mp[34]|webm|pdf|zip|gz)$"
            ),
            F.lit("asset"),
        )
        .when(query.rlike(r"(^|&)(q|query|search|keyword)="), F.lit("search"))
        .when(
            query.rlike(r"(^|&)(page|p|offset)=\d") | path.rlike(r"/page/\d+(/|$)"),
            F.lit("pagination"),
        )
        .when(path.rlike(r"/[^/]*\d{4,}[^/]*$"), F.lit("detail"))
        .otherwise(F.lit("listing"))
    )
