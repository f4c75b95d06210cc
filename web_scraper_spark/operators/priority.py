"""Priority-queue ordering for the frontier (north rule R8).

The reference's crawl order is the deterministic loop nesting
(nausys_tracker.py:367,374,397: config insertion order → competitor,
then yacht, then chronological period). The engine stores that order as
explicit integer columns on every frontier row at insert time, so
ordering is a pure stable sort over data — parseable by Catalyst, no
driver logic:

    PRIORITY KEY = (depth, discovery_round, seed_rank, yacht_rank,
                    period_idx, url)

Depth-0 rows (seed expansion) inherit (seed_rank, yacht_rank,
period_idx) from the seed list; discovered rows (depth>0) get sentinel
ranks and sort after seed work of the same depth, tiebroken by canonical
URL. Per-host order under this key equals the reference's per-host
sequence — the parity target; global interleaving is free to differ.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PRIORITY_COLS",
    "DISCOVERED_SEED_RANK",
    "DISCOVERED_YACHT_RANK",
    "DISCOVERED_PERIOD_IDX",
    "priority_order",
]

PRIORITY_COLS = [
    "depth",
    "discovery_round",
    "seed_rank",
    "yacht_rank",
    "period_idx",
    "url",
]

# sentinels for discovered (non-seed) URLs — match oracle/crawler.py
DISCOVERED_SEED_RANK = 999
DISCOVERED_YACHT_RANK = 9999
DISCOVERED_PERIOD_IDX = 9999


def priority_order(df: DataFrame | None = None) -> list[Column]:
    """Ascending sort columns implementing the priority key."""
    src = df if df is not None else F
    return [F.col(c).asc() for c in PRIORITY_COLS]
