"""Spark-distributed synthetic bench world (big sizes).

The pytest fixture world (sources/fixtures.py) is pure-Python — right
for parity, too slow past ~100k pages. For benchmark scales the world is
generated AS a Spark job: seed expansion + page rendering are Column
expressions, so a 10^7-page world is a parquet write away (the same move
a 100 TB test harness makes: generate distributed, never on the driver).

Pages rendered here use the same span-id grammar as the fixture
template (operators/extract.py parses them identically); values are
deterministic functions of (host, yacht, period) via xxhash64. A slice
of task URLs is deliberately missing from pages (timeout path) and a
slice renders the STATUS:500 marker (http-error path), so the bench
round exercises every outcome branch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from web_scraper_spark.sources.fixtures import FIELDS

__all__ = ["generate_bench_world"]


def _periods_df(spark: SparkSession, start: str, end: str) -> DataFrame:
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.to_date(F.lit(start)), F.to_date(F.lit(end)), F.expr("interval 7 days")
                )
            ).alias("d")
        )
        .filter(F.col("d") < F.to_date(F.lit(end)))
        .select(
            (F.row_number().over(Window.orderBy("d")) - 1).alias("period_idx"),
            F.concat(F.date_format("d", "yyyy-MM-dd"), F.lit(" 17:00:00")).alias("period_from"),
            F.concat(F.date_format(F.date_add("d", 7), "yyyy-MM-dd"), F.lit(" 08:00:00")).alias(
                "period_to"
            ),
        )
    )


def generate_bench_world(
    spark: SparkSession,
    out_dir: str,
    n_hosts: int,
    yachts_per_host: int,
    period_start: str = "2025-04-12",
    period_end: str = "2025-10-25",
    missing_frac: float = 0.04,
    error_frac: float = 0.03,
    page_weight: str = "full",
) -> dict[str, str]:
    """Write seeds/robots/pages parquet; returns path dict.

    ``page_weight``: "full" renders ~18 KB of filler prose per page
    (honest extractor bytes — the throughput bench); "light" skips the
    filler (~1 KB/page) for benches whose question is frontier-state
    cost, not page-scan cost (the 10^7-frontier steady-state run would
    otherwise spend its wall on 180 GB of synthetic prose).
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = {
        "seeds": f"{out_dir}/seeds.parquet",
        "robots": f"{out_dir}/robots.parquet",
        "pages": f"{out_dir}/pages.parquet",
    }

    hosts = spark.range(n_hosts).select(
        F.col("id").cast("int").alias("seed_rank"),
        F.format_string("charter%05d.example.com", F.col("id")).alias("host"),
        F.format_string("comp%05d", F.col("id")).alias("competitor_name"),
    )

    yachts = hosts.crossJoin(
        spark.range(yachts_per_host).select(F.col("id").cast("int").alias("yacht_rank"))
    ).select(
        "*",
        # zero-padded so lexicographic name order == numeric rank order
        # (engine ranks yachts by name; matches fixtures.py padding)
        F.format_string("yacht_%s_%03d", F.col("competitor_name"), F.col("yacht_rank")).alias(
            "yacht_name"
        ),
        (
            F.lit(10_000_000)
            + F.pmod(F.xxhash64("host", "yacht_rank"), F.lit(80_000_000))
        ).cast("string").alias("yacht_id"),
    )

    # seeds table (yacht_ids map per competitor)
    (
        yachts.groupBy("competitor_name", "host", "seed_rank")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("yacht_name", "yacht_id")))
            ).alias("yacht_ids")
        )
        .withColumn("params", F.create_map(F.lit("currency"), F.lit("EUR")))
        .write.mode("overwrite")
        .parquet(paths["seeds"])
    )

    # robots: alternating 30 s / 15 s crawl-delay classes
    (
        hosts.select(
            "host",
            F.array(F.lit("/private"), F.lit("/admin")).alias("disallow"),
            F.when(F.col("seed_rank") % 2 == 0, 30).otherwise(15).alias("crawl_delay_s"),
        ).write.mode("overwrite").parquet(paths["robots"])
    )

    # tasks × periods → pages
    periods = _periods_df(spark, period_start, period_end)
    tasks = yachts.crossJoin(F.broadcast(periods))

    d_from = F.substring("period_from", 1, 10)
    d_to = F.substring("period_to", 1, 10)
    url = F.concat(
        F.lit("https://"), F.col("host"), F.lit("/yacht/"), F.col("yacht_id"),
        F.lit("/period/"), d_from,
        F.lit("?period_to="), d_to, F.lit("&period_from="), d_from,
    )
    h = F.abs(F.xxhash64(url))
    # deterministic outcome classes from the url hash
    klass = F.pmod(h, F.lit(10_000))
    is_missing = klass < int(missing_frac * 10_000)
    is_error = (~is_missing) & (klass < int((missing_frac + error_frac) * 10_000))

    # next-period outlink + one robots-blocked link per page
    next_from = F.concat(F.date_format(F.date_add(F.to_date(d_from), 7), "yyyy-MM-dd"))
    next_to = F.concat(F.date_format(F.date_add(F.to_date(d_to), 7), "yyyy-MM-dd"))
    outlink = F.concat(
        F.lit("https://"), F.col("host"), F.lit("/yacht/"), F.col("yacht_id"),
        F.lit("/period/"), next_from,
        F.lit("?period_to="), next_to, F.lit("&period_from="), next_from,
    )
    blocked_link = F.concat(F.lit("https://"), F.col("host"), F.lit("/private/x/"), F.col("yacht_id"))

    field_rows = []
    for i, name in enumerate(FIELDS):
        val = F.concat(F.lit("v"), F.pmod(h + i, F.lit(100_000)).cast("string"))
        field_rows.append(
            F.concat(
                F.lit(f'<tr><td class="label">{name}</td><td>'
                      f'<span id="yachtReservationDialogForm:tabView:{name}">'),
                val,
                F.lit("</span></td></tr>"),
            )
        )
    # realistic page weight: ~18 KB of deterministic filler prose around
    # the extraction table (real reservation pages are 20-100 KB; the
    # extractor must scan past it, so bench bytes/page are honest)
    filler_sentence = (
        "Lorem charter fleet availability notes segment %d with berth and "
        "skipper manifest entries recorded for audit trail purposes. "
    )
    n_filler = 120 if page_weight == "full" else 0
    filler = F.concat_ws(
        "",
        *[
            F.concat(
                F.lit("<p>" + filler_sentence % i),
                F.pmod(h + 1000 + i, F.lit(10_000_000)).cast("string"),
                F.lit("</p>\n"),
            )
            for i in range(n_filler)
        ],
    ) if n_filler else F.lit("")
    good_html = F.concat(
        F.lit("<html><head><title>Reservation "), F.col("yacht_id"),
        F.lit('</title></head><body>\n<div class="prose">\n'),
        filler,
        F.lit('</div>\n<div id="yachtReservationDialogForm"><table><tbody>\n'),
        F.concat_ws("\n", *field_rows),
        F.lit('\n</tbody></table></div>\n<div class="outlinks">\n<a href="'),
        outlink,
        F.lit('">0</a>\n<a href="'),
        blocked_link,
        F.lit('">1</a>\n</div>\n</body></html>'),
    )
    html = F.when(
        is_error, F.lit("<!--STATUS:500--><html><body>Server Error</body></html>")
    ).otherwise(good_html)

    pages = (
        tasks.filter(~is_missing)
        .select(
            url.alias("url"),
            (F.to_timestamp(F.lit("2025-04-01 00:00:00")) + F.make_interval(secs=F.pmod(h, F.lit(86400)))).alias("warc_ts"),
            F.encode(html, "utf-8").alias("html"),
            F.lit("").alias("text"),  # golden text unused at bench scale
            F.when(F.pmod(h, F.lit(3)) == 0, "tr").otherwise("en").alias("lang"),
        )
    )
    # Fixed 64-way output regardless of the GENERATING session's core
    # count: parquet scans split at row-group boundaries, so a world
    # written by a local[2] session as 2 fat files permanently caps
    # every later page scan (extraction!) at ~2 tasks no matter how
    # many cores the MEASURING session has — exactly the r3/r4 "extract
    # does not scale" artifact (BENCH/stage_scaling_n2_contaminated
    # .json: 87 s at local[2] AND local[8]).
    pages.repartition(64).write.mode("overwrite").parquet(paths["pages"])
    return paths
