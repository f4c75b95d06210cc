"""Shared fixtures: one SparkSession, a small deterministic crawl world,
and a fully-run engine+oracle pair reused by the parity tests."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from web_scraper_spark.oracle.crawler import OracleCrawler
from web_scraper_spark.plans.rounds import CrawlEngine
from web_scraper_spark.session import get_spark
from web_scraper_spark.sources.catalog import ParquetSnapshotCatalog
from web_scraper_spark.sources.fixtures import (
    FixtureConfig,
    PolitenessSpec,
    build_world,
)
from web_scraper_spark.sources.pages_source import resolve_pages, write_world_parquet

N_ROUNDS = 4


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[8]", shuffle_partitions=8, app_name="wss-tests")
    yield s
    s.stop()


def small_config() -> FixtureConfig:
    """~90-URL world with budgets tight enough that politeness binds."""
    return FixtureConfig(
        n_competitors=6,
        yacht_counts=(2, 1, 3, 1, 2, 1),
        period_start="2025-04-12",
        period_end="2025-06-14",  # 9 weekly periods
        missing_page_fraction=0.08,
        error_page_fraction=0.05,
        politeness=PolitenessSpec(
            round_seconds=600,  # host budgets: 20 (30 s hosts) / 40 (15 s)
            global_batch_urls=30,
            global_pause_s=600,
        ),
    )


@pytest.fixture(scope="session")
def world():
    return build_world(small_config())


@pytest.fixture(scope="session")
def oracle(world):
    o = OracleCrawler(world, world.config.politeness)
    o.stats = o.run(N_ROUNDS)
    return o


@pytest.fixture(scope="session", params=["broadcast", "semi", "shuffle"])
def engine_run(request, spark, world):
    """(engine, catalog, stats, tables dict) after N_ROUNDS rounds.

    Parametrized over all three html-fetch join strategies — parity must
    hold on the broadcast path (small budgets), the key-semi path
    (budget-scale selections, html never exchanged), and the
    salted-shuffle path (frontier-scale budgets) alike.
    """
    tmp = tempfile.mkdtemp(prefix="wss_test_")
    paths = write_world_parquet(world, tmp + "/world")
    catalog = ParquetSnapshotCatalog(spark, tmp + "/state")
    engine = CrawlEngine(
        spark,
        catalog,
        world.config.politeness,
        n_buckets=8,
        fetch_join=request.param,
    )
    seeds = spark.read.parquet(paths["seeds"])
    robots = spark.read.parquet(paths["robots"])
    pages = resolve_pages(spark.read.parquet(paths["pages"]))
    engine.init_frontier(seeds, world.config.period_start, world.config.period_end)
    stats = engine.run(N_ROUNDS, pages, robots, seeds)
    tables = {"seeds": seeds, "robots": robots, "pages": pages, "paths": paths, "tmp": tmp}
    yield engine, catalog, stats, tables
    shutil.rmtree(tmp, ignore_errors=True)
