"""Round-4 web-graph battery: redirect resolution, canonical collapse,
anchor-text aggregation, inverted-index postings, HTTP cache policy,
URL classification, and frontier shard balance.

Same contract as battery.py: every entry pairs an engine query over the
driver's parquet tables with a DuckDB oracle. Where the engine runs a
real distributed algorithm (pointer-doubling redirect resolution), the
oracle computes the answer by an INDEPENDENT method (closed form over
the synthetic chain structure) so agreement actually verifies the
algorithm, not a shared implementation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.http_headers import (
    cache_directives,
    cache_max_age_s,
    next_fetch_after,
)
from ..functions.urls import classify_url
from ..operators.anchors import top_anchor_texts
from ..operators.postings import term_postings
from ..operators.redirects import collapse_canonical, resolve_redirects
from .battery import T, q

# deterministic synthetic URL families (identical text on both engines)
_R_URL = "'https://r.example.com/p/' || event_id"
_C_URL = "'https://c.example.com/p/' || event_id"
_T_DST = "'https://t.example.com/d/' || (event_id % 50)"


def _r_url(col="event_id") -> F.Column:
    return F.concat(F.lit("https://r.example.com/p/"), F.col(col).cast("string"))


@q(
    "redirect_resolve",
    f"""
    SELECT {_R_URL} AS url,
           {_R_URL.replace('event_id', '(event_id - event_id % 5)')} AS final_url,
           CAST(event_id % 5 AS INT) AS hops,
           FALSE AS is_loop
    FROM events
    """,
)
def q_redirect_resolve(spark, sf_dir):
    """Beyond-ref: redirect-chain resolution by pointer doubling
    (operators/redirects.py). The synthetic edge table chains each
    event to its predecessor within blocks of 5 (url(e) -> url(e-1)
    unless e % 5 == 0), so the engine's log2-join resolution must land
    every URL on its block head in e % 5 hops. The oracle states that
    closed form directly — it never walks the chain — so a doubling
    bug (missed hop, double-count, wrong terminal) breaks the hash."""
    e = T(spark, sf_dir, "events")
    edges = e.select(
        _r_url().alias("url"),
        F.when(
            F.col("event_id") % 5 != 0,
            F.concat(
                F.lit("https://r.example.com/p/"),
                (F.col("event_id") - 1).cast("string"),
            ),
        ).alias("redirect_to"),
    )
    return resolve_redirects(edges, max_hops=16)


@q(
    "canonical_collapse",
    f"""
    WITH pages AS (
      SELECT {_C_URL} AS url,
             CASE WHEN event_id % 4 <> 0
                  THEN {_C_URL.replace('event_id', '(event_id - event_id % 4)')}
             END AS canonical_url,
             ts AS warc_ts
      FROM events
    ), g AS (
      SELECT COALESCE(canonical_url, url) AS canonical, url, warc_ts FROM pages
    )
    SELECT canonical,
           url AS kept_url,
           CAST(COUNT(*) OVER (PARTITION BY canonical) AS BIGINT) AS n_collapsed
    FROM g
    QUALIFY row_number() OVER (
      PARTITION BY canonical ORDER BY warc_ts DESC, url ASC) = 1
    """,
)
def q_canonical_collapse(spark, sf_dir):
    """Beyond-ref: rel=canonical one-hop collapse
    (operators/redirects.py collapse_canonical). Blocks of 4 declare
    their block head canonical; the engine keeps the latest-crawled
    member per group and counts the collapsed cardinality."""
    e = T(spark, sf_dir, "events")
    pages = e.select(
        F.concat(F.lit("https://c.example.com/p/"), F.col("event_id").cast("string")).alias(
            "url"
        ),
        F.when(
            F.col("event_id") % 4 != 0,
            F.concat(
                F.lit("https://c.example.com/p/"),
                (F.col("event_id") - (F.col("event_id") % 4)).cast("string"),
            ),
        ).alias("canonical_url"),
        F.col("ts").alias("warc_ts"),
    )
    return collapse_canonical(pages).select("canonical", "kept_url", "n_collapsed")


@q(
    "anchor_topk",
    f"""
    WITH counts AS (
      SELECT {_T_DST} AS dst,
             lower(trim(event_type)) AS anchor,
             CAST(COUNT(*) AS BIGINT) AS n_refs
      FROM events
      GROUP BY 1, 2
    )
    SELECT dst, anchor, n_refs, CAST(rn AS INT) AS anchor_rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY dst ORDER BY n_refs DESC, anchor ASC) AS rn
      FROM counts
    )
    WHERE rn <= 2
    """,
)
def q_anchor_topk(spark, sf_dir):
    """Beyond-ref: inbound anchor-text aggregation
    (operators/anchors.py). event_type plays the anchor string; 50
    synthetic targets; top-2 per target with deterministic ties."""
    e = T(spark, sf_dir, "events")
    links = e.select(
        F.concat(
            F.lit("https://t.example.com/d/"), (F.col("event_id") % 50).cast("string")
        ).alias("dst"),
        F.col("event_type").alias("anchor"),
    )
    return top_anchor_texts(links, k=2)


@q(
    "term_postings",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(text, '[^A-Za-z]+')) AS raw
      FROM documents
    ), t AS (
      SELECT doc_id, lower(raw) AS term FROM toks WHERE length(raw) >= 2
    ), per_doc AS (
      SELECT term, doc_id, COUNT(*) AS tf FROM t GROUP BY 1, 2
    )
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS doc_freq,
           CAST(SUM(tf) AS BIGINT) AS coll_freq,
           CAST(MAX(tf) AS BIGINT) AS max_tf
    FROM per_doc GROUP BY term HAVING COUNT(*) >= 2
    """,
)
def q_term_postings(spark, sf_dir):
    """Beyond-ref: inverted-index posting statistics
    (operators/postings.py) — two map-side-combinable aggregations,
    vocabulary-sized shuffle. ASCII-alpha tokenization so both engines
    lowercase identically (full-Unicode casing differs across engines
    and belongs to textstats, not the index)."""
    return term_postings(T(spark, sf_dir, "documents"), min_df=2, min_token_len=2)


_CC_SQL = """CASE CAST(event_id % 7 AS INT)
      WHEN 0 THEN 'no-store'
      WHEN 1 THEN 'no-cache, max-age=300'
      WHEN 2 THEN 'public, max-age=' || (event_id % 900)
      WHEN 3 THEN 'public, max-age=3600'
      WHEN 4 THEN 'private'
      WHEN 5 THEN ''
      ELSE 'max-age=0, must-revalidate' END"""


@q(
    "cache_policy",
    f"""
    WITH h AS (SELECT event_id, ts, {_CC_SQL} AS cc FROM events)
    SELECT event_id,
           CASE CAST(event_id % 7 AS INT)
             WHEN 0 THEN 'no-store' WHEN 1 THEN 'no-cache'
             WHEN 2 THEN 'max-age'  WHEN 3 THEN 'max-age'
             WHEN 4 THEN 'none'     WHEN 5 THEN 'none'
             ELSE 'max-age' END AS policy,
           CASE CAST(event_id % 7 AS INT)
             WHEN 2 THEN CAST(event_id % 900 AS BIGINT)
             WHEN 3 THEN CAST(3600 AS BIGINT)
             WHEN 6 THEN CAST(0 AS BIGINT)
           END AS max_age_s,
           strftime(ts + INTERVAL 1 SECOND * (
             CASE CAST(event_id % 7 AS INT)
               WHEN 0 THEN 0 WHEN 1 THEN 0
               WHEN 2 THEN event_id % 900
               WHEN 3 THEN 3600
               WHEN 4 THEN 86400 WHEN 5 THEN 86400
               ELSE 0 END), '%Y-%m-%d %H:%M:%S') AS next_fetch
    FROM h
    """,
)
def q_cache_policy(spark, sf_dir):
    """Beyond-ref: RFC 9111 cache-policy parsing for revisit scheduling
    (functions/http_headers.py). The engine parses synthesized
    Cache-Control strings with its real regexes; the oracle derives
    the expected policy/max-age/next-fetch from the generator residue
    classes in closed form — regex bugs (directive precedence,
    substring false-positives) surface as hash breaks."""
    e = T(spark, sf_dir, "events")
    m = F.col("event_id") % 7
    cc = (
        F.when(m == 0, F.lit("no-store"))
        .when(m == 1, F.lit("no-cache, max-age=300"))
        .when(m == 2, F.concat(F.lit("public, max-age="), (F.col("event_id") % 900).cast("string")))
        .when(m == 3, F.lit("public, max-age=3600"))
        .when(m == 4, F.lit("private"))
        .when(m == 5, F.lit(""))
        .otherwise(F.lit("max-age=0, must-revalidate"))
    )
    h = e.select("event_id", "ts", cc.alias("cc"))
    return h.select(
        "event_id",
        cache_directives(F.col("cc")).alias("policy"),
        cache_max_age_s(F.col("cc")).alias("max_age_s"),
        F.date_format(
            next_fetch_after(F.col("ts"), F.col("cc")), "yyyy-MM-dd HH:mm:ss"
        ).alias("next_fetch"),
    )


@q(
    "retry_after_parse",
    """
    SELECT event_id,
           CASE CAST(event_id % 5 AS INT)
             WHEN 0 THEN CAST(100 + event_id % 300 AS BIGINT)
             WHEN 1 THEN CAST(0 AS BIGINT)
             WHEN 2 THEN CAST(event_id % 600 AS BIGINT)
             WHEN 3 THEN CAST(0 AS BIGINT)
           END AS retry_after_s
    FROM events
    """,
)
def q_retry_after_parse(spark, sf_dir):
    """Beyond-ref: RFC 9110 Retry-After parsing
    (functions/http_headers.py:retry_after_seconds) — the 429/503
    backoff floor. Five header shapes: delay-seconds, zero, an
    IMF-fixdate in the future (rendered by the engine with the
    weekday name its parser must strip — Spark forbids day-of-week
    parse patterns), an IMF-fixdate in the past (clamps to 0, never
    negative backoff), and garbage (NULL). The oracle states the
    expected seconds in closed form from the id arithmetic."""
    from ..functions.http_headers import retry_after_seconds

    e = T(spark, sf_dir, "events")
    i = F.col("event_id")
    m = i % 5
    future = F.timestamp_add("SECOND", (i % 600).cast("int"), F.col("ts"))
    past = F.timestamp_add("SECOND", F.lit(-3600), F.col("ts"))
    fmt = "EEE, dd MMM yyyy HH:mm:ss 'GMT'"
    header = (
        F.when(m == 0, (F.lit(100) + i % 300).cast("string"))
        .when(m == 1, F.lit("0"))
        .when(m == 2, F.date_format(future, fmt))
        .when(m == 3, F.date_format(past, fmt))
        .otherwise(F.lit("soon"))
    )
    h = e.select("event_id", "ts", header.alias("retry_after"))
    return h.select(
        "event_id",
        retry_after_seconds(F.col("retry_after"), F.col("ts")).alias(
            "retry_after_s"
        ),
    )


@q(
    "url_classify",
    """
    SELECT event_id,
           CASE CAST(event_id % 6 AS INT)
             WHEN 0 THEN 'asset' WHEN 1 THEN 'search' WHEN 2 THEN 'pagination'
             WHEN 3 THEN 'detail' WHEN 4 THEN 'listing' ELSE 'pagination'
           END AS page_class
    FROM events
    """,
)
def q_url_classify(spark, sf_dir):
    """Beyond-ref: pre-fetch page-type classification from URL shape
    (functions/urls.py classify_url). Six synthetic URL families, one
    per generator residue; the engine classifies with its real regex
    CASE, the oracle states the expected class directly."""
    e = T(spark, sf_dir, "events")
    host = F.concat(F.lit("https://s"), (F.col("user_id") % 9).cast("string"), F.lit(".example.com"))
    m = F.col("event_id") % 6
    url = (
        F.when(m == 0, F.concat(host, F.lit("/img/"), F.col("event_id").cast("string"), F.lit(".jpg")))
        .when(m == 1, F.concat(host, F.lit("/find?q=boat"), F.col("event_id").cast("string")))
        .when(m == 2, F.concat(host, F.lit("/fleet/page/"), ((F.col("event_id") % 9) + 1).cast("string")))
        .when(m == 3, F.concat(host, F.lit("/yacht/"), (F.lit(10000) + F.col("event_id")).cast("string")))
        .when(m == 4, F.concat(host, F.lit("/fleet/charter")))
        .otherwise(F.concat(host, F.lit("/list?offset="), (F.col("event_id") % 40).cast("string")))
    )
    return e.select("event_id", classify_url(url).alias("page_class"))


@q(
    "shard_balance",
    f"""
    SELECT substr(md5({_R_URL}), 1, 2) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_urls
    FROM events GROUP BY 1
    """,
)
def q_shard_balance(spark, sf_dir):
    """Beyond-ref: frontier shard-occupancy diagnostic — the balance
    check a 1000-executor deployment runs before choosing partition
    counts. md5-prefix sharding (cross-engine-stable hash per
    battery.py's hashing convention); uniform occupancy across 256
    shards is what makes the politeness/fetch repartition safe."""
    e = T(spark, sf_dir, "events")
    url = _r_url()
    return (
        e.select(F.substring(F.md5(url), 1, 2).alias("shard"))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).cast("long").alias("n_urls"))
    )


# ---------------------------------------------------------------------------
# robots.txt Sitemap records (RFC 9309 §2.3 / sitemaps.org)
# ---------------------------------------------------------------------------

# one robots.txt per synthetic host, identical text on both engines:
# mixed-case directives, inline comment, CRLF line, a duplicate record,
# and an (invalid) relative value that must be dropped
_ROBOTS_TXT_FRAG = """
  'User-agent: *' || chr(10)
  || 'Disallow: /private' || chr(10)
  || CASE WHEN hid % 3 = 0
     THEN 'Sitemap: https://h' || CAST(hid AS STRING)
          || '.example.com/sitemap.xml' || chr(10) ELSE '' END
  || CASE WHEN hid % 4 = 0
     THEN 'sitemap:https://h' || CAST(hid AS STRING)
          || '.example.com/news.xml   # index of the news section'
          || chr(10) ELSE '' END
  || CASE WHEN hid % 5 = 0
     THEN 'Sitemap: /relative.xml' || chr(10) ELSE '' END
  || CASE WHEN hid % 6 = 0
     THEN 'SITEMAP:  https://h' || CAST(hid AS STRING)
          || '.example.com/a.xml' || chr(13) || chr(10) ELSE '' END
  || CASE WHEN hid % 3 = 0
     THEN 'Sitemap: https://h' || CAST(hid AS STRING)
          || '.example.com/sitemap.xml' || chr(10) ELSE '' END
  || 'Disallow: /tmp'
"""


@q(
    "robots_sitemap_discovery",
    f"""
    WITH hosts AS (
      SELECT DISTINCT CAST(event_id % 24 AS INT) AS hid FROM events
    ),
    robots AS (
      SELECT 'h' || CAST(hid AS STRING) AS host,
             {_ROBOTS_TXT_FRAG} AS robots_txt
      FROM hosts
    ),
    lines AS (
      SELECT host,
             trim(regexp_replace(
               unnest(string_split_regex(robots_txt, '\\r?\\n')),
               '#.*$', '')) AS l
      FROM robots
    ),
    vals AS (
      SELECT host,
             trim(regexp_replace(l, '(?i)^sitemap\\s*:', '')) AS sitemap_url
      FROM lines WHERE regexp_matches(lower(l), '^sitemap\\s*:')
    )
    SELECT DISTINCT host, sitemap_url FROM vals
    WHERE regexp_matches(sitemap_url, '^https?://')
    """,
)
def q_robots_sitemap_discovery(spark, sf_dir):
    """Beyond-ref: ``Sitemap:`` record extraction from robots.txt
    (operators/robots_txt.py:robots_sitemaps) — the discovery chain's
    first link (robots -> sitemap ingestion -> frontier). Sitemap
    records are group-INDEPENDENT per RFC 9309 §2.3, matched
    case-insensitively with inline comments stripped; relative values
    are dropped (sitemaps.org requires absolute URLs), duplicates
    collapse. The oracle re-extracts from the identical synthetic
    text with an independent SQL line-walk."""
    from ..operators.robots_txt import robots_sitemaps

    ev = T(spark, sf_dir, "events")
    robots = (
        ev.select((F.col("event_id") % 24).cast("int").alias("hid"))
        .distinct()
        .select(
            F.concat(F.lit("h"), F.col("hid").cast("string")).alias("host"),
            F.expr(_ROBOTS_TXT_FRAG).alias("robots_txt"),
        )
    )
    return robots_sitemaps(robots)


@q(
    "dust_rules",
    """
    SELECT '' AS alpha, 'www.' AS beta,
           count(*)::BIGINT AS support
    FROM events WHERE event_id % 3 = 0
    UNION ALL
    SELECT '', '?utm=1', count(*)::BIGINT
    FROM events WHERE event_id % 3 = 1
    UNION ALL
    SELECT '', 'index.html', count(*)::BIGINT
    FROM events WHERE event_id % 3 = 2
    """,
)
def q_dust_rules(spark, sf_dir):
    """Beyond-ref: DUST rule mining (operators/dust.py — Bar-Yossef et
    al. WWW'07). Each event contributes one two-alias content cluster
    in one of three families (www. prefix / ?utm=1 param /
    index.html suffix); the engine must pair same-fingerprint URLs,
    factor each pair into prefix·α/β·suffix with the non-overlap
    clamp, and count support. The oracle states the expected rule
    table in closed form (one rule per family, support = family
    cardinality) — it never runs the factoring, so a pairing or
    LCP/LCS bug breaks the hash."""
    from ..operators.dust import mine_dust_rules

    e = T(spark, sf_dir, "events").select("event_id")
    fam = F.col("event_id") % 3
    eid = F.col("event_id").cast("string")
    url_a = (
        F.when(fam == 0, F.concat(F.lit("https://d.example.com/p/"), eid))
        .when(fam == 1, F.concat(F.lit("https://d.example.com/a/"), eid))
        .otherwise(
            F.concat(F.lit("https://d.example.com/x/"), eid, F.lit("/"))
        )
    )
    url_b = (
        F.when(
            fam == 0,
            F.concat(F.lit("https://www.d.example.com/p/"), eid),
        )
        .when(
            fam == 1,
            F.concat(F.lit("https://d.example.com/a/"), eid, F.lit("?utm=1")),
        )
        .otherwise(
            F.concat(
                F.lit("https://d.example.com/x/"), eid, F.lit("/index.html")
            )
        )
    )
    fp = F.concat(F.lit("c"), eid)
    pages = e.select(fp.alias("content_hash"), url_a.alias("url")).unionByName(
        e.select(fp.alias("content_hash"), url_b.alias("url"))
    )
    return mine_dust_rules(pages, min_support=5)


@q(
    "surt_cdx",
    """
    WITH base AS (
      SELECT event_id,
             'h' || (event_id % 24)::VARCHAR || '.example.' ||
               CASE WHEN event_id % 2 = 0 THEN 'com' ELSE 'co.uk' END AS host,
             CASE WHEN event_id % 5 = 0 THEN 'www.' ELSE '' END AS www,
             '/P/' || event_id::VARCHAR AS path,
             CASE WHEN event_id % 4 = 0 THEN '?b=2&a=1'
                  WHEN event_id % 4 = 1 THEN '?z=9'
                  ELSE '' END AS rawq,
             CASE WHEN event_id % 4 = 0 THEN '?a=1&b=2'
                  WHEN event_id % 4 = 1 THEN '?z=9'
                  ELSE '' END AS sortedq
      FROM events
    )
    SELECT 'https://' || www || host || path || rawq AS url,
           array_to_string(list_reverse(string_split(host, '.')), ',')
             || ')' || lower(path) || sortedq AS surt
    FROM base
    """,
)
def q_surt_cdx(spark, sf_dir):
    """Beyond-ref: SURT key + CDX index build (operators/cdx.py — the
    IA / Common Crawl archive-lookup convention). Synthetic capture
    URLs exercise www-stripping, host reversal across 2- and 3-label
    public suffixes, path lowercasing, and query-param sorting; the
    engine parses the URL string while the oracle assembles the SURT
    from the generating parts — URL-parser or transform bugs break
    the hash. The engine result rides through build_cdx (range
    partition + in-shard sort), which must be value-preserving."""
    from ..operators.cdx import build_cdx

    e = T(spark, sf_dir, "events").select("event_id")
    eid = F.col("event_id")
    host = F.concat(
        F.lit("h"),
        (eid % 24).cast("string"),
        F.lit(".example."),
        F.when(eid % 2 == 0, F.lit("com")).otherwise(F.lit("co.uk")),
    )
    www = F.when(eid % 5 == 0, F.lit("www.")).otherwise(F.lit(""))
    path = F.concat(F.lit("/P/"), eid.cast("string"))
    rawq = (
        F.when(eid % 4 == 0, F.lit("?b=2&a=1"))
        .when(eid % 4 == 1, F.lit("?z=9"))
        .otherwise(F.lit(""))
    )
    caps = e.select(
        F.concat(F.lit("https://"), www, host, path, rawq).alias("url"),
        (eid % 28).cast("string").alias("warc_ts"),
    )
    return build_cdx(caps, n_shards=8).select("url", "surt")


@q(
    "focus_scores",
    """
    SELECT 'https://f.example.com/c/' || event_id::VARCHAR AS url,
           round(
             0.7 * 0.5 * ((event_id % 100) / 100.0)
             + (1.0 - 0.7) * CASE event_id % 4
                 WHEN 0 THEN 1.0 WHEN 1 THEN 0.5 WHEN 3 THEN 0.5
                 ELSE 0.0 END,
             9
           ) AS focus_score
    FROM events
    """,
)
def q_focus_scores(spark, sf_dir):
    """Beyond-ref: focused-crawl frontier scoring (operators/focus.py
    — fish/shark-search inherited relevance + anchor-term overlap).
    Each event is one discovery edge: parent = event_id % 100 with
    relevance k/100, anchor text in one of four families overlapping
    the topic set {yacht, charter} by 2/2, 1/2, 0/2, 1/2 terms. The
    oracle states the scoring formula in closed form over the
    generating parameters — join, tokenization, intersect, and
    max-aggregation bugs all break the hash."""
    from ..operators.focus import focus_scores

    e = T(spark, sf_dir, "events").select("event_id")
    eid = F.col("event_id")
    anchor = (
        F.when(eid % 4 == 0, F.lit("yacht charter weekly"))
        .when(eid % 4 == 1, F.lit("charter"))
        .when(eid % 4 == 2, F.lit("contact us"))
        .otherwise(F.lit("cheap yacht deals"))
    )
    disc = e.select(
        F.concat(
            F.lit("https://f.example.com/p/"), (eid % 100).cast("string")
        ).alias("parent_url"),
        F.concat(F.lit("https://f.example.com/c/"), eid.cast("string")).alias(
            "url"
        ),
        anchor.alias("anchor_text"),
    )
    parents = (
        e.select((eid % 100).alias("k"))
        .distinct()
        .select(
            F.concat(
                F.lit("https://f.example.com/p/"), F.col("k").cast("string")
            ).alias("url"),
            (F.col("k") / F.lit(100.0)).alias("score"),
        )
    )
    return focus_scores(
        disc, parents, ["yacht", "charter"], decay=0.5, gamma=0.7
    )


@q(
    "budget_allocation",
    """
    WITH w AS (
      SELECT 'h' || (user_id % 37) AS host, count(*)::DOUBLE AS priority
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT host, priority,
             10000.0e0 * priority / (SELECT sum(priority) FROM w) AS share
      FROM w
    ),
    b AS (
      SELECT host, priority, floor(share)::BIGINT AS base,
             share - floor(share) AS rem
      FROM s
    ),
    r AS (
      SELECT host, priority, base,
             row_number() OVER (ORDER BY rem DESC, host ASC) AS rn
      FROM b
    )
    SELECT host, priority,
           (base + CASE WHEN rn <= (SELECT 10000 - sum(base) FROM b)
                        THEN 1 ELSE 0 END)::BIGINT AS allocation
    FROM r
    """,
)
def q_budget_allocation(spark, sf_dir):
    """Beyond-ref: largest-remainder (Hamilton) apportionment of a
    10,000-URL global round budget across 37 hosts proportional to
    priority weight (operators/apportion.py) — sums to the budget
    EXACTLY, every host within 1 of its ideal share, top-L remainder
    selection via the range-partitioned distributed limit (never a
    single-partition window). Integer weights make the double shares
    bit-identical across engines, so the oracle's independent
    window-rank method must agree on every seat."""
    from ..operators.apportion import allocate_budget

    ev = T(spark, sf_dir, "events")
    wdf = ev.groupBy(
        F.concat(F.lit("h"), (F.col("user_id") % 37).cast("string")).alias(
            "host"
        )
    ).agg(F.count("*").cast("double").alias("priority"))
    return allocate_budget(wdf, 10_000)


@q(
    "feed_parse",
    """
    WITH o AS (
      SELECT o_orderkey AS k, o_custkey % 16 AS h, o_orderdate::DATE AS d
      FROM orders WHERE o_orderkey < 2400
    ),
    e AS (
      SELECT k, h, d,
             CASE WHEN h % 2 = 0 THEN 'rss' ELSE 'atom' END AS kind,
             row_number() OVER (PARTITION BY h ORDER BY k) - 1 AS entry_idx,
             lpad((k % 60)::VARCHAR, 2, '0') AS ss
      FROM o
    )
    SELECT 'https://feed' || h || '.example.com/' ||
             CASE WHEN h % 2 = 0 THEN 'rss.xml' ELSE 'atom.xml' END AS feed_url,
           kind,
           entry_idx::INT AS entry_idx,
           'Order ' || k AS title,
           'https://feed' || h || '.example.com/post/' || k AS link,
           'urn:order:' || k AS entry_id,
           CASE WHEN h % 2 = 0
                THEN strftime(d, '%a, %d %b %Y') || ' 09:15:' || ss || ' GMT'
                ELSE strftime(d, '%Y-%m-%d') || 'T09:15:' || ss || 'Z'
           END AS published,
           strftime(d, '%Y-%m-%d') || ' 09:15:' || ss AS pub_iso
    FROM e
    """,
)
def q_feed_parse(spark, sf_dir):
    """RSS/Atom feed ingestion round-trip (operators/feeds.py): render
    per-host RSS 2.0 <item> feeds (even hosts) and Atom <entry> feeds
    (odd hosts) from orders rows — RFC 822 pubDates with the weekday
    prefix and a 'GMT' zone name, ISO-8601 Atom <updated>, padded
    whitespace inside RSS <link> — then parse them back with the
    native-regex feed parser. The oracle states the expected entries
    directly from the source rows, so the parse must exactly invert the
    rendering, including both date grammars landing on the same UTC
    instant (pub_iso)."""
    from ..operators.feeds import parse_feed_entries

    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2400)
    k = F.col("o_orderkey")
    h = (F.col("o_custkey") % 16).cast("string")
    is_rss = F.col("o_custkey") % 2 == 0
    host = F.concat(F.lit("feed"), h, F.lit(".example.com"))
    ss = F.lpad((k % 60).cast("string"), 2, "0")
    d = F.col("o_orderdate").cast("date")
    rss_item = F.concat(
        F.lit("<item>\n  <title>Order "), k.cast("string"),
        F.lit("</title>\n  <link> https://"), host,
        F.lit("/post/"), k.cast("string"),
        F.lit(' </link>\n  <guid isPermaLink="false">urn:order:'),
        k.cast("string"),
        F.lit("</guid>\n  <pubDate>"),
        F.date_format(d, "EEE, dd MMM yyyy"),
        F.lit(" 09:15:"), ss, F.lit(" GMT</pubDate>\n</item>\n"),
    )
    atom_entry = F.concat(
        F.lit("<entry>\n  <title>Order "), k.cast("string"),
        F.lit('</title>\n  <link rel="alternate" href="https://'), host,
        F.lit("/post/"), k.cast("string"),
        F.lit('"/>\n  <id>urn:order:'), k.cast("string"),
        F.lit("</id>\n  <updated>"),
        F.date_format(d, "yyyy-MM-dd"),
        F.lit("T09:15:"), ss, F.lit("Z</updated>\n</entry>\n"),
    )
    rendered = o.select(
        host.alias("host"),
        is_rss.alias("is_rss"),
        F.struct(
            k.alias("k"), F.when(is_rss, rss_item).otherwise(atom_entry).alias("e")
        ).alias("s"),
    )
    feeds = rendered.groupBy("host", "is_rss").agg(
        F.concat(
            F.when(
                F.col("is_rss"),
                F.lit("<rss><channel>\n<title>Host feed</title>\n"),
            ).otherwise(
                F.lit('<feed xmlns="http://www.w3.org/2005/Atom">\n<title>Host feed</title>\n')
            ),
            F.array_join(
                F.transform(F.sort_array(F.collect_list("s")), lambda s: s["e"]), ""
            ),
            F.when(F.col("is_rss"), F.lit("</channel></rss>")).otherwise(
                F.lit("</feed>")
            ),
        ).alias("body"),
    ).select(
        F.concat(
            F.lit("https://"),
            F.col("host"),
            F.when(F.col("is_rss"), F.lit("/rss.xml")).otherwise(F.lit("/atom.xml")),
        ).alias("url"),
        "body",
    )
    parsed = parse_feed_entries(feeds)
    return parsed.select(
        "feed_url",
        "kind",
        "entry_idx",
        "title",
        "link",
        "entry_id",
        "published",
        F.date_format("published_ts", "yyyy-MM-dd HH:mm:ss").alias("pub_iso"),
    )


@q(
    "head_metadata",
    """
    WITH o AS (
      SELECT o_orderkey AS k, o_custkey % 10 AS h
      FROM orders WHERE o_orderkey < 2400
    )
    SELECT 'https://m' || h || '.example.com/p/' || k AS url,
           'Page ' || k AS title,
           CASE k % 3 WHEN 0 THEN 'en' WHEN 1 THEN 'tr' ELSE NULL END AS lang,
           CASE WHEN k % 2 = 0
                THEN 'https://m' || h || '.example.com/canon/' || (k % 100)
                ELSE NULL END AS canonical,
           CASE WHEN k % 3 = 0 THEN 'Desc ' || k ELSE NULL END AS meta_description,
           'OG ' || k AS og_title,
           (k % 6 = 0 OR k % 6 = 3) AS robots_noindex,
           (k % 6 = 3) AS robots_nofollow,
           CASE WHEN k % 2 = 1
                THEN 'en=https://m' || h || '.example.com/en/' || k
                     || ';tr=https://m' || h || '.example.com/tr/' || k
                ELSE '' END AS hreflang_s,
           CASE WHEN k % 4 = 0
                THEN 'https://m' || h || '.example.com/rss.xml'
                ELSE '' END AS feeds_s
    FROM o
    """,
)
def q_head_metadata(spark, sf_dir):
    """HTML head-metadata extraction round-trip (operators/headmeta.py):
    render <head> sections from orders rows with adversarial variety —
    attribute order flipped per row, single-quote and unquoted attribute
    styles, uppercase tag/attr names, rel token lists, a stylesheet
    <link> and charset <meta> as distractors, 'none' robots implying
    both flags — then extract canonical/hreflang/OpenGraph/meta-robots/
    feed-autodiscovery back. The oracle states the expected values
    directly from the source rows."""
    from ..operators.headmeta import parse_head_meta

    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2400)
    k = F.col("o_orderkey")
    ks = k.cast("string")
    h = (F.col("o_custkey") % 10).cast("string")
    site = F.concat(F.lit("https://m"), h, F.lit(".example.com"))
    canon_link = F.when(
        k % 2 == 0,
        F.when(
            k % 4 == 0,
            # quote-style variety: unquoted href on k%5==0 rows
            F.when(
                k % 5 == 0,
                F.concat(
                    F.lit('<link rel="canonical" href='), site,
                    F.lit("/canon/"), (k % 100).cast("string"), F.lit(">\n"),
                ),
            ).otherwise(
                F.concat(
                    F.lit('<link rel="canonical" href="'), site,
                    F.lit("/canon/"), (k % 100).cast("string"), F.lit('">\n'),
                ),
            ),
        ).otherwise(
            F.concat(
                F.lit("<LINK HREF='"), site, F.lit("/canon/"),
                (k % 100).cast("string"), F.lit("' REL='canonical'>\n"),
            ),
        ),
    ).otherwise(F.lit(""))
    hreflang_links = F.when(
        k % 2 == 1,
        F.concat(
            F.lit('<link rel="alternate" hreflang="TR" href="'), site,
            F.lit("/tr/"), ks, F.lit('">\n'),
            F.lit('<link hreflang="en" rel="alternate" href="'), site,
            F.lit("/en/"), ks, F.lit('">\n'),
        ),
    ).otherwise(F.lit(""))
    feed_link = F.when(
        k % 4 == 0,
        F.concat(
            F.lit('<link rel="alternate" type="application/rss+xml" href="'),
            site, F.lit('/rss.xml" title="Feed">\n'),
        ),
    ).otherwise(F.lit(""))
    robots_meta = (
        F.when(k % 6 == 0, F.lit('<meta name="robots" content="noindex, follow">\n'))
        .when(k % 6 == 3, F.lit("<meta content='none' name='ROBOTS'>\n"))
        .otherwise(F.lit(""))
    )
    desc_meta = F.when(
        k % 3 == 0,
        F.concat(F.lit('<meta name="description" content="Desc '), ks, F.lit('">\n')),
    ).otherwise(F.lit(""))
    og_meta = F.when(
        k % 2 == 0,
        F.concat(F.lit('<meta property="og:title" content="OG '), ks, F.lit('">\n')),
    ).otherwise(
        F.concat(F.lit('<META CONTENT="OG '), ks, F.lit('" PROPERTY="og:title">\n')),
    )
    html_open = (
        F.when(k % 3 == 0, F.lit('<html lang="en">'))
        .when(k % 3 == 1, F.lit("<HTML LANG='tr'>"))
        .otherwise(F.lit("<html>"))
    )
    html = F.concat(
        html_open,
        F.lit('<head><meta charset="utf-8">\n<title>Page '), ks,
        F.lit("</title>\n"),
        F.lit('<link rel="stylesheet" href="/css/site.css">\n'),
        canon_link, hreflang_links, feed_link, robots_meta, desc_meta, og_meta,
        F.lit("</head><body><h1>Page "), ks,
        F.lit('</h1><link rel="canonical" href="/body-decoy"></body></html>'),
    )
    pages = o.select(
        F.concat(site, F.lit("/p/"), ks).alias("url"), html.alias("html")
    )
    m = parse_head_meta(pages)
    return m.select(
        "url",
        "title",
        "lang",
        "canonical",
        "meta_description",
        "og_title",
        "robots_noindex",
        "robots_nofollow",
        F.array_join(
            F.transform(
                F.col("hreflang"), lambda s: F.concat(s["lang"], F.lit("="), s["href"])
            ),
            ";",
        ).alias("hreflang_s"),
        F.array_join(F.col("feed_hrefs"), ";").alias("feeds_s"),
    )


@q(
    "jsonld_extract",
    """
    WITH o AS (
      SELECT o_orderkey AS k, o_custkey % 10 AS h,
             strftime(o_orderdate::DATE, '%Y-%m-%d') AS d
      FROM orders WHERE o_orderkey < 2400
    )
    SELECT 'https://m' || h || '.example.com/p/' || k AS url,
           0 AS block_idx, 'Article' AS jtype, NULL AS name,
           'Story ' || k AS headline, d AS date_published,
           CASE WHEN k % 3 = 2 THEN NULL ELSE 'Author ' || (k % 50) END AS author_name,
           NULL AS price, NULL AS price_currency
    FROM o
    UNION ALL
    SELECT 'https://m' || h || '.example.com/p/' || k,
           1, 'Product', 'Item ' || k, NULL, NULL, NULL,
           (k % 500) || '.99', 'EUR'
    FROM o WHERE k % 2 = 0
    UNION ALL
    SELECT 'https://m' || h || '.example.com/p/' || k,
           CASE WHEN k % 2 = 0 THEN 2 ELSE 1 END,
           NULL, NULL, NULL, NULL, NULL, NULL, NULL
    FROM o WHERE k % 7 = 0
    """,
)
def q_jsonld_extract(spark, sf_dir):
    """JSON-LD extraction round-trip (operators/jsonld.py): render pages
    carrying a schema.org Article block (author alternates between
    nested-object, bare-string, and absent forms), a Product block with
    offers on even keys, a malformed trailing block on k%7 rows (must
    keep its row with NULL fields), and a text/javascript decoy script
    that must NOT be extracted. The oracle states the expected
    projection per block directly from the source rows."""
    from ..operators.jsonld import extract_jsonld

    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2400)
    k = F.col("o_orderkey")
    ks = k.cast("string")
    h = (F.col("o_custkey") % 10).cast("string")
    d = F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd")
    author = (
        F.when(
            k % 3 == 0,
            F.concat(
                F.lit(',"author":{"@type":"Person","name":"Author '),
                (k % 50).cast("string"), F.lit('"}'),
            ),
        )
        .when(
            k % 3 == 1,
            F.concat(F.lit(',"author":"Author '), (k % 50).cast("string"), F.lit('"')),
        )
        .otherwise(F.lit(""))
    )
    article = F.concat(
        F.lit('<script type="application/ld+json">\n'
              '{"@context":"https://schema.org","@type":"Article","headline":"Story '),
        ks, F.lit('","datePublished":"'), d, F.lit('"'), author,
        F.lit("}\n</script>\n"),
    )
    product = F.when(
        k % 2 == 0,
        F.concat(
            F.lit("<script charset=\"utf-8\" type='application/ld+json'>"
                  '{"@type":"Product","name":"Item '),
            ks,
            F.lit('","offers":{"@type":"Offer","price":"'),
            (k % 500).cast("string"),
            F.lit('.99","priceCurrency":"EUR"}}</script>\n'),
        ),
    ).otherwise(F.lit(""))
    broken = F.when(
        k % 7 == 0,
        F.lit('<script type="application/ld+json">{"broken": </script>\n'),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head><title>P</title>\n"
              '<script type="text/javascript">var x = {"name":"decoy"};</script>\n'),
        article, product, broken,
        F.lit("</head><body>Page "), ks, F.lit("</body></html>"),
    )
    pages = o.select(
        F.concat(F.lit("https://m"), h, F.lit(".example.com/p/"), ks).alias("url"),
        html.alias("html"),
    )
    j = extract_jsonld(pages)
    return j.select(
        "url", "block_idx", "jtype", "name", "headline",
        "date_published", "author_name", "price", "price_currency",
    )


@q(
    "pagination_chains",
    """
    WITH e AS (SELECT event_id AS id FROM events),
         m AS (SELECT max(id) AS mx FROM e)
    SELECT 'https://pg.example.com/list/' || id AS url,
           'https://pg.example.com/list/' || (id - id % 5) AS chain_head,
           CAST(id % 5 AS INT) AS position,
           LEAST(5, mx - (id - id % 5) + 1)::BIGINT AS chain_len,
           FALSE AS is_loop
    FROM e, m
    """,
)
def q_pagination_chains(spark, sf_dir):
    """Pagination reconstruction end-to-end (operators/pagination.py):
    render rel=next/rel=prev head links chaining events into blocks of
    5, extract the hints with parse_head_meta, then rebuild each chain
    by inverted pointer doubling. The oracle states head/position/length
    in closed form from the block structure — it never walks a chain —
    so a doubling or inversion bug breaks the hash. The trailing block
    is allowed to be short (LEAST guard); a dangling next on the last
    page must not mint a phantom chain member."""
    from ..operators.headmeta import parse_head_meta
    from ..operators.pagination import pagination_chains

    ev = T(spark, sf_dir, "events")
    e = F.col("event_id")
    es = e.cast("string")
    url = F.concat(F.lit("https://pg.example.com/list/"), es)
    nxt = F.when(
        e % 5 != 4,
        F.concat(
            F.lit('<link rel="next" href="https://pg.example.com/list/'),
            (e + 1).cast("string"), F.lit('">\n'),
        ),
    ).otherwise(F.lit(""))
    prv = F.when(
        e % 5 != 0,
        F.concat(
            F.lit("<link href='https://pg.example.com/list/"),
            (e - 1).cast("string"), F.lit("' rel='prev'>\n"),
        ),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head><title>L</title>\n"), nxt, prv,
        F.lit("</head><body>list</body></html>"),
    )
    # the events parquet is one small file -> one input split; spread
    # the synthetic pages across the cores before the regex parse (at
    # corpus scale the HTML table is many splits and this is free)
    pages = ev.select(url.alias("url"), html.alias("html")).repartition(
        spark.sparkContext.defaultParallelism
    )
    meta = parse_head_meta(pages)
    return pagination_chains(meta).select(
        "url", "chain_head", "position", "chain_len", "is_loop"
    )


@q(
    "hreflang_clusters",
    """
    WITH e AS (
      SELECT event_id AS id, event_id - event_id % 4 AS base,
             CASE event_id % 4 WHEN 0 THEN 'de' WHEN 1 THEN 'en'
                               WHEN 2 THEN 'fr' ELSE 'tr' END AS lang
      FROM events
      WHERE event_id - event_id % 4 + 3 <= (SELECT max(event_id) FROM events)
    )
    SELECT 'https://t' || (base % 7) || '.example.com/' || lang || '/g' || base AS url,
           'https://t' || (base % 7) || '.example.com/de/g' || base AS cluster,
           4::BIGINT AS cluster_size
    FROM e
    """,
)
def q_hreflang_clusters(spark, sf_dir):
    """Translation-set clustering end-to-end (operators/translations.py):
    events form 4-language groups (de/en/fr/tr); de/en/tr members
    declare the full hreflang set but the fr member declares ONLY en —
    the cluster must still close transitively to all 4. Extraction runs
    through parse_head_meta; clustering through min-label connected
    components. The oracle states cluster id (lexicographic min = the
    de member) and size 4 in closed form from the group structure."""
    from ..operators.headmeta import parse_head_meta
    from ..operators.translations import hreflang_clusters

    ev = T(spark, sf_dir, "events")
    e = F.col("event_id")
    # drop a truncated trailing group so size-4 closure holds at any N
    mx = ev.agg(F.max("event_id").alias("mx"))
    ev = ev.join(F.broadcast(mx)).filter(e - e % 4 + 3 <= F.col("mx"))
    base = e - e % 4
    lang = (
        F.when(e % 4 == 0, F.lit("de"))
        .when(e % 4 == 1, F.lit("en"))
        .when(e % 4 == 2, F.lit("fr"))
        .otherwise(F.lit("tr"))
    )
    site = F.concat(F.lit("https://t"), (base % 7).cast("string"), F.lit(".example.com"))
    gs = base.cast("string")

    def alt(lg):
        return F.concat(
            F.lit('<link rel="alternate" hreflang="'), F.lit(lg),
            F.lit('" href="'), site, F.lit("/"), F.lit(lg),
            F.lit("/g"), gs, F.lit('">\n'),
        )

    links = F.when(
        e % 4 == 2, alt("en")  # sloppy fr member: declares only en
    ).otherwise(F.concat(alt("de"), alt("en"), alt("fr"), alt("tr")))
    html = F.concat(
        F.lit("<html><head><title>T</title>\n"), links,
        F.lit("</head><body>t</body></html>"),
    )
    url = F.concat(site, F.lit("/"), lang, F.lit("/g"), gs)
    # single-file parquet input -> single split; parallelize the
    # synthetic-HTML regex parse (free at corpus scale, see above)
    pages = ev.select(url.alias("url"), html.alias("html")).repartition(
        spark.sparkContext.defaultParallelism
    )
    meta = parse_head_meta(pages)
    return hreflang_clusters(meta).select("url", "cluster", "cluster_size")


_MIRROR_DOCS_SQL = """
      SELECT CASE WHEN event_id % 12 < 6
                  THEN 'solo' || (event_id % 12)
                  ELSE 'm' || (event_id % 12) END AS host,
             CASE WHEN (event_id - event_id % 12) // 12 % 50 = 0 THEN 'boiler'
                  WHEN event_id % 12 < 6
                  THEN 'u' || (event_id % 12) || '_' || ((event_id - event_id % 12) // 12)
                  WHEN ((event_id - event_id % 12) // 12) % 4 = event_id % 2
                  THEN 'priv_' || (event_id % 12) || '_' || ((event_id - event_id % 12) // 12)
                  ELSE 'sh_' || (event_id % 12 - event_id % 2) || '_'
                       || ((event_id - event_id % 12) // 12) END AS fp
      FROM events
"""


@q(
    "mirror_hosts",
    f"""
    WITH d AS (SELECT DISTINCT host, fp FROM ({_MIRROR_DOCS_SQL})),
    nh AS (SELECT fp FROM d GROUP BY fp HAVING count(*) BETWEEN 2 AND 8),
    d2 AS (SELECT * FROM d WHERE fp IN (SELECT fp FROM nh)),
    pairs AS (
      SELECT a.host AS host_a, b.host AS host_b, count(*)::BIGINT AS shared
      FROM d2 a JOIN d2 b ON a.fp = b.fp AND a.host < b.host
      GROUP BY 1, 2
    ),
    sizes AS (SELECT host, count(*) AS n FROM d GROUP BY host)
    SELECT host_a, host_b, shared,
           round(shared / LEAST(sa.n, sb.n), 4) AS overlap
    FROM pairs
    JOIN sizes sa ON pairs.host_a = sa.host
    JOIN sizes sb ON pairs.host_b = sb.host
    WHERE shared >= 5
    """,
)
def q_mirror_hosts(spark, sf_dir):
    """Mirror-host detection (operators/mirrors.py, Bharat & Broder
    WWW'99 class): events build 6 singleton hosts with unique
    fingerprints, 3 mirror PAIRS sharing a fingerprint namespace with
    per-side private quarters (so overlap < 1), and a 'boiler'
    fingerprint on every host that the max_fp_hosts cap must drop (12
    hosts > cap 8) — without the cap it would mint C(12,2)=66 spurious
    pairs. Expected output: exactly the 3 mirror pairs. The oracle
    recomputes pairs by an INDEPENDENT SQL self-join over the same
    construction, so the bound, dedup, or denominator going wrong
    breaks the hash."""
    from ..operators.mirrors import mirror_hosts

    ev = T(spark, sf_dir, "events")
    e = F.col("event_id")
    site = e % 12
    page = ((e - e % 12) / 12).cast("long")
    host = F.when(
        site < 6, F.concat(F.lit("solo"), site.cast("string"))
    ).otherwise(F.concat(F.lit("m"), site.cast("string")))
    fp = (
        F.when(page % 50 == 0, F.lit("boiler"))
        .when(
            site < 6,
            F.concat(
                F.lit("u"), site.cast("string"), F.lit("_"), page.cast("string")
            ),
        )
        .when(
            page % 4 == e % 2,
            F.concat(
                F.lit("priv_"), site.cast("string"), F.lit("_"), page.cast("string")
            ),
        )
        .otherwise(
            F.concat(
                F.lit("sh_"), (site - e % 2).cast("string"), F.lit("_"),
                page.cast("string"),
            )
        )
    )
    docs = ev.select(host.alias("host"), fp.alias("fingerprint"))
    return mirror_hosts(docs, min_shared=5, max_fp_hosts=8).orderBy(
        "host_a", "host_b"
    )


@q(
    "link_header_parse",
    """
    SELECT event_id, '/list/' || (event_id + 1) AS href, 'next' AS rel
    FROM events WHERE event_id % 3 = 0
    UNION ALL
    SELECT event_id, '/list/' || (event_id - 1), 'prev'
    FROM events WHERE event_id % 3 = 0
    UNION ALL
    SELECT event_id, 'https://cdn' || (event_id % 5) || '.example.com/c/' || event_id,
           'canonical'
    FROM events WHERE event_id % 3 = 1
    """,
)
def q_link_header_parse(spark, sf_dir):
    """RFC 8288 Link-header parsing (functions/http_headers.py:
    link_header_entries): k%3==0 responses carry next+prev link-values,
    k%3==1 a canonical with a quoted 'a, b' title (the comma must not
    split the value), k%3==2 a link-value with NO rel param that must
    contribute nothing. Native regex + explode; the oracle states the
    expected (href, rel) rows directly."""
    from ..functions.http_headers import link_header_entries

    ev = T(spark, sf_dir, "events")
    e = F.col("event_id")
    es = e.cast("string")
    hdr = (
        F.when(
            e % 3 == 0,
            F.concat(
                F.lit('</list/'), (e + 1).cast("string"),
                F.lit('>; rel="next", </list/'), (e - 1).cast("string"),
                F.lit('>; rel="prev"'),
            ),
        )
        .when(
            e % 3 == 1,
            F.concat(
                F.lit("<https://cdn"), (e % 5).cast("string"),
                F.lit(".example.com/c/"), es,
                F.lit('>; rel=canonical; title="a, b"'),
            ),
        )
        .otherwise(
            F.concat(F.lit("<https://x/"), es, F.lit('>; type="text/html"'))
        )
    )
    rows = ev.select("event_id", link_header_entries(hdr).alias("links"))
    return rows.select(
        "event_id", F.explode("links").alias("l")
    ).select("event_id", F.col("l.href").alias("href"), F.col("l.rel").alias("rel"))
