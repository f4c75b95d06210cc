"""Developer debug dump — SURVEY §2 W5.

The reference tracker ends a run by printing its result dict as JSON to
stdout (``print(json.dumps({"results": ...}))``, mmk_tracker.py:341) so
a developer can eyeball what a round produced. The engine's equivalent
must stay safe on a 100 TB DataFrame: never collect the full result to
the driver, never print unbounded output. ``debug_dump`` therefore

- caps the dump at ``limit`` rows (``limit+1`` fetched so the dump can
  say it was truncated),
- serializes driver-side via ``toJSON`` on the LIMITed frame only (the
  limit is pushed into the plan — Spark's CollectLimit — so executors
  stop after ``limit+1`` rows; no full materialization),
- returns the JSON text AND optionally writes it to ``path`` — writes
  land as a single local file, not a distributed write, because the
  point is a developer artifact, not a dataset.

Dev-only by design; production metrics ride the round writes as
Observations (plans/rounds.py), never through this path.
"""

from __future__ import annotations

import json
from typing import Optional

from pyspark.sql import DataFrame

__all__ = ["debug_dump"]


def debug_dump(
    df: DataFrame,
    path: Optional[str] = None,
    limit: int = 100,
    echo: bool = False,
) -> str:
    """JSON-dump up to ``limit`` rows of ``df``; return the text.

    The payload mirrors the reference's shape — a dict with a
    ``results`` list — plus ``schema`` (DDL string) and ``truncated``
    so a capped dump is never mistaken for the whole result.
    """
    if limit < 1:
        raise ValueError("limit must be >= 1")
    rows = [json.loads(r) for r in df.limit(limit + 1).toJSON().collect()]
    truncated = len(rows) > limit
    payload = {
        "results": rows[:limit],
        "schema": df.schema.simpleString(),
        "truncated": truncated,
    }
    text = json.dumps(payload, indent=2, sort_keys=True, default=str)
    if path is not None:
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(text)
    if echo:
        print(text)
    return text
