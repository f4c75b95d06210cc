"""spark-submit entry point: run crawl rounds from a packaged zip.

The north rule mandates the engine run "via spark-submit --py-files on
multi-executor clusters". This is that entry point — no repo checkout
needed on executors; the package ships as a zip:

    python benchkit/package.py                      # builds dist/wss.zip
    spark-submit --master local[32] \
        --py-files dist/wss.zip \
        benchkit/submit_round.py \
        --world /tmp/wss_bench_cache/h120_y8 --rounds 2 --state /tmp/wss_state

On a real cluster, swap --master for yarn/k8s and add executor sizing;
the job itself is identical (the engine never assumes local mode).
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--world", required=True, help="dir with seeds/robots/pages_resolved parquet")
    ap.add_argument("--state", required=True, help="catalog root for frontier/log tables")
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--round-seconds", type=int, default=86400)
    ap.add_argument("--global-budget", type=int, default=200_000)
    args = ap.parse_args()

    # Import AFTER spark-submit has set up --py-files on sys.path.
    from pyspark.sql import SparkSession

    from web_scraper_spark.plans.rounds import CrawlEngine
    from web_scraper_spark.sources.catalog import ParquetSnapshotCatalog
    from web_scraper_spark.sources.fixtures import PolitenessSpec

    spark = SparkSession.builder.appName("wss-submit-round").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    spec = PolitenessSpec(
        round_seconds=args.round_seconds,
        global_batch_urls=args.global_budget,
        global_pause_s=args.round_seconds,
    )
    catalog = ParquetSnapshotCatalog(spark, args.state)
    engine = CrawlEngine(spark, catalog, spec, n_buckets=32)

    seeds = spark.read.parquet(f"{args.world}/seeds.parquet")
    robots = spark.read.parquet(f"{args.world}/robots.parquet")
    pages = spark.read.parquet(f"{args.world}/pages_resolved.parquet")

    if not catalog.exists("frontier"):
        engine.init_frontier(seeds, "2025-04-12", "2025-10-25")

    start = catalog.last_committed_round()
    stats = engine.run(start + args.rounds, pages, robots, seeds)
    for s in stats:
        print(json.dumps({k: v for k, v in s.items() if k != "status"}))
    spark.stop()
    return 0


if __name__ == "__main__":
    main()
