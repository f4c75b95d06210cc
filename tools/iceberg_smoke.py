"""Execute one real CrawlEngine run against a LOCAL Iceberg warehouse.

Usage (requires the iceberg-spark-runtime jar, absent from this
sandbox — see COVERAGE.md "Iceberg execution" note)::

    ICEBERG_JAR=/path/to/iceberg-spark-runtime-4.0_2.13-<ver>.jar \
        python tools/iceberg_smoke.py

Builds the deterministic fixture world, runs CrawlEngine for 2 rounds
with IcebergCatalog (MERGE INTO frontier, per-round tag, dynamic
partition-overwrite logs), then proves:

- resume is a no-op (re-running ``run(2, ...)`` adds no snapshot);
- extending to round 3 continues from the committed state;
- time travel: ``read("frontier", version=1)`` differs from current;
- the frontier/seen state matches a ParquetSnapshotCatalog run of the
  SAME world (the two catalog backends are interchangeable).

Exit 0 = all checks pass. This is the executed twin of the SQL-text
pins in tests/test_iceberg_catalog.py; tests/test_iceberg_catalog.py::
test_executed_round_with_jar runs this script when a jar is present.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    jar = os.environ.get("ICEBERG_JAR", "")
    if not jar or not os.path.exists(jar):
        print("ICEBERG_JAR not set or missing", file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    warehouse = tempfile.mkdtemp(prefix="wss_ice_wh_")
    state_pq = tempfile.mkdtemp(prefix="wss_ice_pq_")
    world_dir = tempfile.mkdtemp(prefix="wss_ice_world_")
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("iceberg-smoke")
        .config("spark.jars", jar)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions."
            "IcebergSparkSessionExtensions",
        )
        .config(
            "spark.sql.catalog.crawl",
            "org.apache.iceberg.spark.SparkCatalog",
        )
        .config("spark.sql.catalog.crawl.type", "hadoop")
        .config("spark.sql.catalog.crawl.warehouse", warehouse)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    try:
        from tests.conftest import small_config

        from web_scraper_spark.plans.rounds import CrawlEngine
        from web_scraper_spark.sources.catalog import ParquetSnapshotCatalog
        from web_scraper_spark.sources.fixtures import build_world
        from web_scraper_spark.sources.iceberg_catalog import IcebergCatalog
        from web_scraper_spark.sources.pages_source import (
            resolve_pages,
            write_world_parquet,
        )

        cfg = small_config()
        world = build_world(cfg)
        paths = write_world_parquet(world, world_dir + "/world")
        seeds = spark.read.parquet(paths["seeds"])
        robots = spark.read.parquet(paths["robots"])
        pages = resolve_pages(spark.read.parquet(paths["pages"]))

        ice = IcebergCatalog(spark, catalog="crawl", namespace="web")
        assert ice.available(), "catalog conf not visible"
        eng = CrawlEngine(spark, ice, cfg.politeness, n_buckets=8)
        eng.init_frontier(seeds, cfg.period_start, cfg.period_end)
        eng.run(2, pages, robots, seeds)

        v_after_2 = ice.current_version("frontier")
        # resume no-op
        eng.run(2, pages, robots, seeds)
        assert ice.current_version("frontier") == v_after_2, "resume re-ran"
        # extend
        eng.run(3, pages, robots, seeds)
        assert ice.current_version("frontier") > v_after_2, "no round 3"
        # time travel
        cur = ice.read("frontier").count()
        v1 = ice.read("frontier", version=1).count()
        assert v1 != cur or ice.versions("frontier") != [1], "no history"

        # backend interchangeability: parquet catalog, same world
        cat = ParquetSnapshotCatalog(spark, state_pq)
        eng2 = CrawlEngine(spark, cat, cfg.politeness, n_buckets=8)
        eng2.init_frontier(seeds, cfg.period_start, cfg.period_end)
        eng2.run(3, pages, robots, seeds)

        def state(c):
            return {
                (r.url, r.state, r.attempts)
                for r in c.read("frontier")
                .select("url", "state", "attempts")
                .collect()
            }

        assert state(ice) == state(cat), "iceberg/parquet state diverged"
        print("ICEBERG_SMOKE_OK")
        return 0
    finally:
        spark.stop()
        for d in (warehouse, state_pq, world_dir):
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
