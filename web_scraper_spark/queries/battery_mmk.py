"""Battery part 3: the MMK tracker family (T2 generator, S3 JSON
listing source, T4 enrichment join, F4 price sanity) + A2 map
accumulation.

Registered into the same ``REGISTRY`` as battery.py; portability rules
as there (identical aliases, rounded doubles, cast aggregates).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.prices import is_valid_price_text
from ..operators.generators import mmk_weekly_periods
from ..operators.listings import enrich_listings, parse_boats_json
from .battery import T, q

# -------------------------------------------------------------------------
# T2 — next-Saturday + 180-day horizon generator
# -------------------------------------------------------------------------


@q(
    "weekly_periods_mmk",
    """
    WITH bases AS (
      SELECT unnest(generate_series(DATE '2025-04-07', DATE '2025-04-20', INTERVAL 1 DAY))::DATE AS b
    ),
    sat AS (
      SELECT b, b + (CASE WHEN isodow(b) = 7 THEN 6 ELSE 6 - isodow(b) END)::INT AS ns
      FROM bases
    ),
    starts AS (
      SELECT b, unnest(generate_series(ns, ns + 179, INTERVAL 7 DAY))::DATE AS d
      FROM sat
    )
    SELECT strftime(b, '%Y-%m-%d') AS base_date,
           (row_number() OVER (PARTITION BY b ORDER BY d) - 1)::INT AS period_idx,
           strftime(d, '%Y-%m-%d') AS date_from,
           strftime(d + INTERVAL 7 DAY, '%Y-%m-%d') AS date_to,
           epoch_ms(d::TIMESTAMP) AS date_from_ms,
           epoch_ms((d + INTERVAL 7 DAY)::TIMESTAMP) AS date_to_ms
    FROM starts
    """,
)
def q_weekly_periods_mmk(spark, sf_dir):
    """T2 — the MMK generator (mmk_tracker.py:115-120,166-172): next
    Saturday (a Saturday base maps to itself), weekly [start, start+7d)
    pairs while start < next_saturday + 180 d, bounds as epoch millis at
    midnight. 14 consecutive base dates cover every weekday including
    both weekend edge cases."""
    bases = (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.to_date(F.lit("2025-04-07")),
                    F.to_date(F.lit("2025-04-20")),
                    F.expr("interval 1 day"),
                )
            ).alias("base_date")
        )
    )
    out = mmk_weekly_periods(bases, "base_date", horizon_days=180)
    return out.select(
        F.date_format("base_date", "yyyy-MM-dd").alias("base_date"),
        "period_idx",
        F.date_format("date_from", "yyyy-MM-dd").alias("date_from"),
        F.date_format("date_to", "yyyy-MM-dd").alias("date_to"),
        "date_from_ms",
        "date_to_ms",
    )


# -------------------------------------------------------------------------
# S3 + T4 — JSON listing source + enrichment join with per-field defaults
# -------------------------------------------------------------------------


@q(
    "listing_enrich",
    """
    WITH real AS (
      SELECT 'comp' || s_nationkey AS competitor,
             'yacht_' || s_suppkey AS yacht_name,
             s_suppkey::VARCHAR AS yacht_id,
             s_suppkey::VARCHAR AS resource_id,
             'base' || s_nationkey AS base_id,
             CASE WHEN s_suppkey % 7 = 0 THEN 'Bareboat'
                  WHEN s_suppkey % 4 = 0 THEN 'Skippered'
                  ELSE 'Bareboat' END AS product_id,
             'Yacht ' || s_name AS yacht_fullname,
             s_name AS company_name,
             'port' || (s_suppkey % 7) AS port,
             round(abs(s_acctbal), 2) AS deposit
      FROM supplier
    ),
    phantom AS (
      SELECT 'comp' || s_nationkey,
             'yacht_' || (s_suppkey + 100000),
             (s_suppkey + 100000)::VARCHAR,
             (s_suppkey + 100000)::VARCHAR,
             'base_default',
             'Bareboat',
             'yacht_' || (s_suppkey + 100000),
             'comp' || s_nationkey,
             '',
             0.0
      FROM supplier WHERE s_suppkey % 5 = 0
    )
    SELECT * FROM real UNION ALL SELECT * FROM phantom
    """,
)
def q_listing_enrich(spark, sf_dir):
    """S3 + T4 — build per-competitor ``{"boats": [...]}`` JSON payloads
    from the supplier table, parse them back with ``from_json`` +
    ``explode`` (S3), then enrich a task list by broadcast left join
    with per-field ``coalesce`` defaults (T4). Phantom yacht ids (no
    boat in the listing) exercise the all-defaults branch; a missing
    ``product`` key (suppkey % 7 == 0, null → omitted by to_json)
    exercises the 'Bareboat' fallback; ' Turizm' suffixes (suppkey % 3
    == 0) exercise the P9 strip. The oracle derives the expected output
    directly from supplier — an independent path that never touches
    JSON, so the round-trip itself is under test."""
    sup = T(spark, sf_dir, "supplier")
    competitor = F.concat(F.lit("comp"), F.col("s_nationkey").cast("string"))
    boats_src = sup.select(
        competitor.alias("competitor"),
        F.struct(
            F.col("s_suppkey").cast("string").alias("id"),
            F.concat(F.lit("base"), F.col("s_nationkey").cast("string")).alias(
                "baseId"
            ),
            F.when(
                F.col("s_suppkey") % 7 != 0,
                F.array(
                    F.struct(
                        F.when(F.col("s_suppkey") % 4 == 0, F.lit("Skippered"))
                        .otherwise(F.lit("Bareboat"))
                        .alias("id")
                    )
                ),
            ).alias("product"),
            F.concat(F.lit("Yacht "), F.col("s_name")).alias("fullName"),
            F.when(
                F.col("s_suppkey") % 3 == 0,
                F.concat(F.col("s_name"), F.lit(" Turizm")),
            )
            .otherwise(F.col("s_name"))
            .alias("company"),
            F.concat(F.lit("port"), (F.col("s_suppkey") % 7).cast("string")).alias(
                "base"
            ),
            F.round(F.abs(F.col("s_acctbal")), 2).alias("deposit"),
        ).alias("boat"),
    )
    listings = boats_src.groupBy("competitor").agg(
        F.to_json(
            F.struct(F.sort_array(F.collect_list("boat")).alias("boats"))
        ).alias("listing_json")
    )
    real_tasks = sup.select(
        competitor.alias("competitor"),
        F.concat(F.lit("yacht_"), F.col("s_suppkey").cast("string")).alias(
            "yacht_name"
        ),
        F.col("s_suppkey").cast("string").alias("yacht_id"),
    )
    phantom_tasks = sup.filter(F.col("s_suppkey") % 5 == 0).select(
        competitor.alias("competitor"),
        F.concat(F.lit("yacht_"), (F.col("s_suppkey") + 100000).cast("string")).alias(
            "yacht_name"
        ),
        (F.col("s_suppkey") + 100000).cast("string").alias("yacht_id"),
    )
    tasks = real_tasks.unionByName(phantom_tasks)
    boats = parse_boats_json(listings, "listing_json")
    return enrich_listings(tasks, boats, default_base_id="base_default")


# -------------------------------------------------------------------------
# F4 — price-text sanity predicate, folded into the MMK parse
# -------------------------------------------------------------------------


@q(
    "price_sanity",
    """
    WITH s AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_linenumber % 5 = 0 THEN 'NaN € (NaN € - 0%)'
                  WHEN l_linenumber % 6 = 0 THEN 'From 1,234 €'
                  WHEN l_linenumber % 7 = 0 THEN '５00 € (550 € - 2%)'
                  ELSE ((floor(l_extendedprice * 100 + 0.5)::BIGINT // 100)::VARCHAR || ' € (' ||
                        (floor(l_extendedprice * 110 + 0.5)::BIGINT // 100)::VARCHAR || ' € - ' ||
                        (l_linenumber % 30)::VARCHAR || '%)')
             END AS price_text
      FROM lineitem WHERE l_orderkey <= 2000
    )
    SELECT l_orderkey, l_linenumber,
           (regexp_matches(price_text, '^\\p{Nd}') AND NOT contains(price_text, 'NaN')) AS valid,
           CASE WHEN regexp_matches(price_text, '^\\p{Nd}') AND NOT contains(price_text, 'NaN')
                THEN regexp_extract(price_text, '([0-9,\\.]+)\\s*€', 1)
                ELSE '' END AS total_str
    FROM s
    """,
)
def q_price_sanity(spark, sf_dir):
    """F4 — the MMK price-text sanity gate (mmk_tracker.py:196-203:
    starts-with-digit AND no 'NaN') ahead of the P2 regex parse.
    Invalid shapes ('NaN € …', 'From 1,234 €') are injected and must be
    flagged false with no extraction."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    total = F.expr(
        "div(cast(floor(l_extendedprice * 100 + 0.5) as bigint), 100)"
    ).cast("string")
    lst = F.expr(
        "div(cast(floor(l_extendedprice * 110 + 0.5) as bigint), 100)"
    ).cast("string")
    pct = (F.col("l_linenumber") % 30).cast("string")
    price_text = (
        F.when(F.col("l_linenumber") % 5 == 0, F.lit("NaN € (NaN € - 0%)"))
        .when(F.col("l_linenumber") % 6 == 0, F.lit("From 1,234 €"))
        # Unicode digit (fullwidth ５, category Nd): the reference's
        # Python `re.search(r'^\\d', ...)` accepts it — so must the gate
        .when(F.col("l_linenumber") % 7 == 0, F.lit("５00 € (550 € - 2%)"))
        .otherwise(
            F.concat(total, F.lit(" € ("), lst, F.lit(" € - "), pct, F.lit("%)"))
        )
    )
    df = li.select(
        "l_orderkey",
        "l_linenumber",
        price_text.alias("price_text"),
        is_valid_price_text(price_text).alias("valid"),
    )
    return df.select(
        "l_orderkey",
        "l_linenumber",
        "valid",
        F.when(
            F.col("valid"), F.regexp_extract("price_text", r"([0-9,\.]+)\s*€", 1)
        )
        .otherwise(F.lit(""))
        .alias("total_str"),
    )


# -------------------------------------------------------------------------
# P3 — labeled-sibling DOM extraction (the MMK 'Price:' label walk)
# -------------------------------------------------------------------------


@q(
    "price_sibling_extract",
    """
    WITH s AS (
      SELECT l_orderkey, l_linenumber,
             '<div class="row"><div class="lbl">Price:</div> <div class="val">' ||
             CASE WHEN l_linenumber % 5 = 0 THEN 'NaN €'
                  ELSE ((floor(l_extendedprice * 100 + 0.5)::BIGINT // 100)::VARCHAR || ' €')
             END || '</div></div><div class="lbl">Other:</div><div>x</div>' AS html
      FROM lineitem WHERE l_orderkey <= 2000
    ),
    x AS (
      SELECT l_orderkey, l_linenumber,
             trim(regexp_extract(html, 'Price:</div>\\s*<div[^>]*>([^<]*)</div>', 1)) AS price_text
      FROM s
    )
    SELECT l_orderkey, l_linenumber, price_text,
           (regexp_matches(price_text, '^[0-9]') AND NOT contains(price_text, 'NaN')) AS valid
    FROM x
    """,
)
def q_price_sibling_extract(spark, sf_dir):
    """P3 — the MMK sibling-DOM walk (mmk_tracker.py:196-203: find the
    'Price:' label div, take the next sibling div's text, then the F4
    sanity gate) as one native ``regexp_extract`` over the serialized
    DOM — no tree walk, no Python. A 'NaN €' sibling (every 5th row)
    must extract but fail the sanity gate, mirroring the reference's
    skip branch."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    euros = F.expr(
        "div(cast(floor(l_extendedprice * 100 + 0.5) as bigint), 100)"
    ).cast("string")
    html = F.concat(
        F.lit('<div class="row"><div class="lbl">Price:</div> <div class="val">'),
        F.when(F.col("l_linenumber") % 5 == 0, F.lit("NaN €")).otherwise(
            F.concat(euros, F.lit(" €"))
        ),
        F.lit('</div></div><div class="lbl">Other:</div><div>x</div>'),
    )
    price_text = F.trim(
        F.regexp_extract(html, r"Price:</div>\s*<div[^>]*>([^<]*)</div>", 1)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        price_text.alias("price_text"),
        is_valid_price_text(price_text).alias("valid"),
    )


# -------------------------------------------------------------------------
# S2 — param template scan: params map → canonical query string
# -------------------------------------------------------------------------


@q(
    "param_template_scan",
    """
    SELECT c_custkey,
           'https://api.example.com/search?currency=EUR&market=' || c_mktsegment ||
           '&nation=' || c_nationkey || '&tier=' || (c_custkey % 3) AS url
    FROM customer WHERE c_custkey <= 2000
    """,
)
def q_param_template_scan(spark, sf_dir):
    """S2 — the reference's per-competitor request params dict
    (config.py params / mmk_tracker.py:127 ``session.get(url,
    params=...)``) as an engine op: build the params as a MapType
    column, render the canonical query string via
    ``map_entries → sort_array → concat → array_join`` (sorted params —
    the same normalization ``canonicalize_url`` applies). The oracle
    derives the string directly from the base columns."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 2000)
    params = F.create_map(
        F.lit("market"), F.col("c_mktsegment"),
        F.lit("nation"), F.col("c_nationkey").cast("string"),
        F.lit("currency"), F.lit("EUR"),
        F.lit("tier"), (F.col("c_custkey") % 3).cast("string"),
    )
    qs = F.array_join(
        F.transform(
            F.sort_array(F.map_entries(params)),
            lambda e: F.concat(e["key"], F.lit("="), e["value"]),
        ),
        "&",
    )
    return c.select(
        "c_custkey",
        F.concat(F.lit("https://api.example.com/search?"), qs).alias("url"),
    )


# -------------------------------------------------------------------------
# A2 — dict accumulation: map_from_entries(sort_array(collect_list(...)))
# -------------------------------------------------------------------------


@q(
    "seeds_map_accum",
    """
    WITH s AS (
      SELECT o_custkey,
             'o' || o_orderkey AS k,
             (floor(o_totalprice * 100 + 0.5)::BIGINT) AS cents
      FROM orders WHERE o_orderkey <= 4000
    )
    SELECT o_custkey,
           '{' || string_agg('"' || k || '":' || cents, ',' ORDER BY k) || '}' AS seeds_map_json
    FROM s GROUP BY o_custkey
    """,
)
def q_seeds_map_accum(spark, sf_dir):
    """A2 — the reference's per-competitor dict accumulation
    (nausys_tracker.py:157-170) as the engine op
    ``map_from_entries(sort_array(collect_list(struct(k, v))))``; the
    map is projected to its canonical JSON string for cross-engine
    hashing (entry order = sorted keys on both sides)."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 4000)
    k = F.concat(F.lit("o"), F.col("o_orderkey").cast("string"))
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    return (
        o.select("o_custkey", F.struct(k.alias("k"), cents.alias("v")).alias("e"))
        .groupBy("o_custkey")
        .agg(
            F.to_json(
                F.map_from_entries(F.sort_array(F.collect_list("e")))
            ).alias("seeds_map_json")
        )
    )
