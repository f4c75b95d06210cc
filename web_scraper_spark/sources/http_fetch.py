"""Live-fetch stage scaffold (op P12 — executor-lifetime client state).

The reference keeps one authenticated ``requests.Session`` alive across
every fetch (nausys_tracker.py:202-214 builds it once from Selenium
cookies; mmk_tracker.py:104-110 same pattern). The distributed
re-expression: the HTTP client is constructed ONCE PER PYTHON WORKER
PROCESS and reused across every Arrow batch that worker handles — never
per row, never per batch. The sandbox has no network, so the *stage* is
generic over a client factory: production plugs a real pooled HTTP
client in; tests plug a mock that counts its own constructions, and the
init-once contract is asserted in tests/test_http_fetch.py
(constructions == worker processes, not rows).

Dataflow position: this stage replaces the pages-table lookup join in
``plans.rounds`` on a live crawl — same politeness-bounded input, same
(url, status, body) output shape feeding the outcome split.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["http_fetch_stage", "make_mock_client", "FETCH_SCHEMA"]


class _MockClient:
    """Offline stand-in for a pooled HTTP client (no network in this
    environment): deterministic 200 + echo body, counts its gets."""

    def __init__(self):
        self.n_gets = 0

    def get(self, url: str):
        self.n_gets += 1
        return 200, f"payload:{url}"


def make_mock_client() -> _MockClient:
    return _MockClient()

FETCH_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("status", IntegerType(), True),
        StructField("body", StringType(), True),
        StructField("worker_pid", LongType(), False),
        StructField("client_seq", IntegerType(), False),
    ]
)

# per-worker-process client cache: survives across tasks/batches while
# the Python worker is reused (spark.python.worker.reuse, default on).
# Keyed by client identity — Spark reuses ONE Python worker pool for
# every stage in the session, so an unkeyed singleton would hand stage B
# the client stage A constructed (observed: a test-suite mock leaking
# into the live-round fetch through reused workers).
_CLIENTS: dict[str, object] = {}
_CONSTRUCTIONS: dict[str, int] = {}


def _get_client(factory: Callable[[], object], key: str) -> tuple:
    """(client, constructions-so-far) for this worker process and key.

    Runs as a by-reference module function on the worker, so it mutates
    the live module globals — unlike the mapInPandas closure itself,
    which cloudpickle ships by value with a snapshot globals dict (a
    bare global read from the closure would always see the pickle-time
    value).
    """
    if key not in _CLIENTS:
        _CLIENTS[key] = factory()
        _CONSTRUCTIONS[key] = _CONSTRUCTIONS.get(key, 0) + 1
    return _CLIENTS[key], _CONSTRUCTIONS[key]


def http_fetch_stage(
    df: DataFrame,
    make_client: Callable[[], object],
    url_col: str = "url",
    keep_cols: bool = False,
    client_key: str | None = None,
) -> DataFrame:
    """Arrow-batched fetch: ``client.get(url) -> (status, body)``.

    ``make_client`` runs at most once per worker process (P12's session
    reuse); every output row carries (worker_pid, client_seq) lineage so
    the init-once contract is directly observable: ``client_seq`` is the
    number of constructions this worker had performed when the row was
    fetched — it must be 1 everywhere.

    ``client_key`` names the per-worker client slot (default: the
    factory's module-qualified name) — two stages wanting DIFFERENT
    clients must use distinct factory functions or pass distinct keys;
    two stages sharing a factory share its per-worker client.

    ``keep_cols=True`` carries every input column through alongside the
    fetch output (the live-round mode: the politeness-selected frontier
    row rides with its own fetch result, so the downstream outcome
    split/extraction needs no re-join). Task retries re-fetch that
    task's URLs — at-least-once fetch; the caller makes the ROUND
    exactly-once by materializing this stage's output idempotently
    (``write_round_partition``) before anything consumes it.
    """
    fetch_fields = [
        f for f in FETCH_SCHEMA.fields if keep_cols is False or f.name != "url"
    ]
    if keep_cols:
        in_fields = [f for f in df.schema.fields]
        schema = StructType(in_fields + fetch_fields)
        keep = [f.name for f in in_fields]
    else:
        schema = StructType(fetch_fields)
        keep = None

    key = client_key or (
        f"{getattr(make_client, '__module__', '?')}."
        f"{getattr(make_client, '__qualname__', repr(make_client))}"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client, n_constructions = _get_client(make_client, key)
        pid = os.getpid()
        for pdf in batches:
            out = [client.get(u) for u in pdf[url_col]]
            base = pdf[keep] if keep is not None else pd.DataFrame(
                {"url": list(pdf[url_col])}
            )
            yield base.assign(
                status=[s for s, _ in out],
                body=[b for _, b in out],
                worker_pid=pid,
                client_seq=n_constructions,
            )

    src = df if keep_cols else df.select(url_col)
    return src.mapInPandas(run, schema=schema)
