"""Merge-on-read frontier parity: `frontier_mode="mor"` must produce
the EXACT same frontier state as the copy-on-write mode after every
round — same rows, same states, same attempts/backoff — while writing
only budget-proportional deltas between compaction points.

Compaction cadence 2 over 4 rounds exercises both branches (rounds
1, 3 = delta writes; rounds 2, 4 = compaction snapshots), plus resume
on top of a delta round (the merged read must reconstruct the exact
pre-round state from base + deltas)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from web_scraper_spark.plans.rounds import FRONTIER_COLS, CrawlEngine
from web_scraper_spark.sources.catalog import ParquetSnapshotCatalog
from web_scraper_spark.sources.pages_source import resolve_pages, write_world_parquet

N_ROUNDS = 4


def _frontier_rows(engine: CrawlEngine, as_of: int):
    df = engine._read_frontier(as_of).select(*FRONTIER_COLS)
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def mor_pair(spark, world):
    """(cow_engine, mor_engine, inputs): same world, independent state."""
    tmp = tempfile.mkdtemp(prefix="wss_mor_")
    paths = write_world_parquet(world, tmp + "/world")
    seeds = spark.read.parquet(paths["seeds"])
    robots = spark.read.parquet(paths["robots"])
    pages = resolve_pages(spark.read.parquet(paths["pages"]))
    engines = {}
    for mode in ("cow", "mor"):
        catalog = ParquetSnapshotCatalog(spark, f"{tmp}/state_{mode}")
        engines[mode] = CrawlEngine(
            spark,
            catalog,
            world.config.politeness,
            n_buckets=8,
            frontier_mode=mode,
            mor_compact_every=2,
        )
        engines[mode].init_frontier(
            seeds, world.config.period_start, world.config.period_end
        )
    yield engines["cow"], engines["mor"], (pages, robots, seeds)
    shutil.rmtree(tmp, ignore_errors=True)


def test_mor_matches_cow_every_round(mor_pair):
    cow, mor, (pages, robots, seeds) = mor_pair
    for r in range(1, N_ROUNDS + 1):
        s_cow = cow.run_round(r, pages, robots, seeds)
        s_mor = mor.run_round(r, pages, robots, seeds)
        for k in ("selected", "success", "empty", "error", "robots", "discovered", "seen_total"):
            assert s_cow[k] == s_mor[k], f"round {r}: {k}"
        assert _frontier_rows(cow, r) == _frontier_rows(mor, r), f"round {r}"


def test_mor_writes_are_delta_sized_and_compaction_prunes(mor_pair):
    cow, mor, _ = mor_pair
    cat = mor.catalog
    # rounds 2 and 4 compacted: only snapshot versions 0, 2, 4 exist
    assert cat.versions("frontier") == [0, 2, 4]
    # all folded deltas were dropped at the round-4 compaction
    assert cat.log_round_ids("frontier_delta") == []
    # the delta rounds recorded the base version they overlaid, not a
    # new snapshot
    assert cat.read_round_manifest(1)["frontier_version"] == 0
    assert cat.read_round_manifest(2)["frontier_version"] == 2
    assert cat.read_round_manifest(3)["frontier_version"] == 2


def test_mor_resume_from_delta_round(spark, world, mor_pair):
    """Re-running committed rounds no-ops; extending past them reuses
    the merged (base + delta) state exactly."""
    cow, mor, (pages, robots, seeds) = mor_pair
    before = _frontier_rows(mor, N_ROUNDS)
    stats = mor.run(N_ROUNDS, pages, robots, seeds)  # all committed
    assert all(s["status"] == "committed" for s in stats)
    assert _frontier_rows(mor, N_ROUNDS) == before


def test_mor_read_time_travel_after_compaction(mor_pair):
    """Time travel to compaction points stays exact after deltas are
    pruned. (Delta rounds between compactions are NOT time-travelable
    once their deltas were folded — the same trade Iceberg makes when
    expire_snapshots prunes history.)"""
    cow, mor, _ = mor_pair
    for r in (2, 4):
        assert _frontier_rows(mor, r) == _frontier_rows(cow, r), f"as_of {r}"
