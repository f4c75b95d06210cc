"""Gap-based sessionization over event/fetch logs.

Web-log sessionization is the canonical stateful grouping a crawl /
training-data pipeline needs over its own telemetry (fetch logs,
user-event streams): merge consecutive events of one key into a
session whenever the gap to the previous event is below a threshold,
then aggregate per session.

Spark-first shape — ``F.session_window`` is the NATIVE operator for
this (Spark 3.2+): one shuffle on the session key, sessions are merged
map-side per partition before the exchange, and the identical
expression runs under Structured Streaming with a watermark (late
events merge into existing sessions until the watermark passes). No
window-function self-scan, no Python.

Semantics contract (pinned by the DuckDB oracle twin, which computes
sessions by the independent lag/island method): an event starts a NEW
session iff ``ts - prev_ts > gap`` — Spark merges session windows that
TOUCH, so an event at exactly ``prev_ts + gap`` continues the session;
``session_end`` is ``last_ts + gap``, matching Spark's window end.

At 100 TB the plan is one hash-partition exchange on ``key`` (the
map-side partial merge bounds shuffle rows by sessions-per-partition,
not events) — equivalent to the log-proportional shuffle of any
groupBy, with no skew beyond the key's own event skew (a hot key is a
hot host; salting does not apply because sessions need key-global
ordering, so hot keys are bounded by the politeness budget upstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
) -> DataFrame:
    """Merge per-key events into gap-separated sessions.

    Returns one row per (key, session): ``session_start`` (first event
    ts), ``session_end`` (last event ts + gap, Spark's native window
    end), ``n_events``, and ``sum_value`` (round-4, present only when
    ``value_col`` is given).
    """
    aggs = [
        F.count("*").alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("sum_value"))
    return (
        events.groupBy(key_col, F.session_window(F.col(ts_col), gap))
        .agg(*aggs)
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            *(["sum_value"] if value_col is not None else []),
        )
    )
