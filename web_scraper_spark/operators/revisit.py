"""Adaptive re-crawl scheduling: estimate per-URL change rates from
fetch history and derive the next revisit round.

The reference re-crawls everything on a fixed daily cycle
(`run_daily_tracking` loops, nausys_tracker.py:389-437 — every yacht,
every day, unconditionally). At 10^10 URLs a uniform cycle wastes the
fetch budget on pages that never change and goes stale on pages that
change hourly. The classic fix (Cho & Garcia-Molina, "Estimating
Frequency of Change", ACM TOIT 2003) models each page as a Poisson
change process and estimates its rate from *sampled* observations —
did the content fingerprint differ between consecutive visits?

Estimator (their bias-corrected MLE for n equal-ish intervals of mean
length Ī, of which X showed a change)::

    lambda_hat = -ln((n - X + 0.5) / (n + 0.5)) / Ī

The +0.5 terms keep the estimate finite when every visit changed
(X == n); X == 0 is pinned to rate exactly 0.0 (never observed to
change) and handled by the clamp, not a division. The revisit
interval targets an expected ``target`` changes per revisit::

    interval = clamp(target / lambda_hat, min_interval, max_interval)

Two equivalent computations are provided:

- :func:`revisit_schedule` — the *batch* form: one window pass (lag
  fingerprint over the per-URL visit sequence) + one hash aggregation
  over the full visit history. Two data-proportional shuffles, no
  UDFs. History-proportional: right for backfills and as the oracle
  twin for the incremental form.
- :func:`update_revisit_stats` + :func:`schedule_from_stats` — the
  *incremental* form the engine runs: a compact per-URL stats table
  (visit/interval/change counters + last fingerprint) is merged with
  each round's extractions (budget-proportional join, like the seen
  bloom's OR-merge) and the schedule is pure column arithmetic over
  the stats snapshot. Per-round cost never rescans history.
  Equivalence with the batch form is pinned by
  tests/test_revisit.py::test_incremental_stats_match_batch_window.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "RevisitPolicy",
    "REVISIT_STATS_COLS",
    "change_rates",
    "revisit_schedule",
    "update_revisit_stats",
    "schedule_from_stats",
]


@dataclass(frozen=True)
class RevisitPolicy:
    """Revisit-interval policy (rounds are the time unit)."""

    target: float = 0.5
    min_interval: int = 1
    max_interval: int = 64
    # interval for URLs with a single visit (no interval evidence yet)
    default_interval: int = 8


REVISIT_STATS_COLS = [
    "n_visits",
    "n_intervals",
    "n_changes",
    "first_round",
    "last_round",
    "last_fp",
]


def _rate_expr() -> F.Column:
    """change-rate column over stats-shaped columns
    (n_intervals, n_changes, first_round, last_round).

    NULL when there is no interval evidence; exactly 0.0 when the page
    never changed (not the IEEE -0.0 that -ln(1.0) produces, which
    DuckDB and Spark hash differently)."""
    n = F.col("n_intervals").cast("double")
    x = F.col("n_changes").cast("double")
    mean_interval = (
        (F.col("last_round") - F.col("first_round")).cast("double") / n
    )
    rate = F.when(
        x > 0,
        -F.log((n - x + F.lit(0.5)) / (n + F.lit(0.5))) / mean_interval,
    ).otherwise(F.lit(0.0))
    return F.when(n > 0, rate)


def change_rates(
    history: DataFrame, key_cols: list[str] | None = None
) -> DataFrame:
    """Per-URL change-rate estimate from a visit log (batch form).

    ``history`` columns: the key (default ``url_hash``; pass
    ``key_cols=["url_hash", "url"]`` for the collision-proof composite
    the engine uses), ``round_id`` (visit time, integer rounds) and
    ``fingerprint`` (content hash at that visit). Returns one row per
    key::

        (*key, n_visits, n_intervals, n_changes, last_round,
         mean_interval, change_rate)

    ``change_rate`` is NULL for URLs with fewer than 2 visits (no
    interval evidence yet); callers fall back to a default interval.
    """
    keys = key_cols or ["url_hash"]
    w = Window.partitionBy(*keys).orderBy("round_id")
    obs = history.select(
        *keys,
        "round_id",
        "fingerprint",
        F.lag("fingerprint").over(w).alias("prev_fp"),
    )
    agg = obs.groupBy(*keys).agg(
        F.count("*").alias("n_visits"),
        F.count("prev_fp").alias("n_intervals"),
        F.sum(
            F.when(
                F.col("prev_fp").isNotNull()
                & (F.col("fingerprint") != F.col("prev_fp")),
                1,
            ).otherwise(0)
        ).alias("n_changes"),
        F.max("round_id").alias("last_round"),
        F.min("round_id").alias("first_round"),
    )
    n = F.col("n_intervals").cast("double")
    mean_interval = (
        (F.col("last_round") - F.col("first_round")).cast("double") / n
    )
    return agg.select(
        *keys,
        "n_visits",
        "n_intervals",
        "n_changes",
        "last_round",
        "first_round",
        F.when(n > 0, mean_interval).alias("mean_interval"),
        _rate_expr().alias("change_rate"),
    )


def _schedule(
    rates: DataFrame,
    keys: list[str],
    target: float,
    min_interval: int,
    max_interval: int,
    default_interval: int,
) -> DataFrame:
    raw = F.lit(float(target)) / F.col("change_rate")
    # floor (not cast) so the DuckDB oracle can mirror the exact same
    # double -> integer semantics (casts round there, truncate here);
    # never-changed pages (rate exactly 0) jump to max_interval without
    # a division — DuckDB turns double x/0.0 into NULL, not IEEE inf
    interval = F.floor(
        F.when(
            F.col("change_rate").isNull(), F.lit(float(default_interval))
        )
        .when(F.col("change_rate") <= 0, F.lit(float(max_interval)))
        .otherwise(
            F.least(
                F.greatest(raw, F.lit(float(min_interval))),
                F.lit(float(max_interval)),
            )
        )
    )
    return rates.select(
        *keys,
        "n_changes",
        "n_intervals",
        F.round("change_rate", 6).alias("change_rate"),
        interval.alias("interval"),
        (F.col("last_round") + interval).alias("next_due"),
    )


def revisit_schedule(
    history: DataFrame,
    *,
    key_cols: list[str] | None = None,
    target: float = 0.5,
    min_interval: int = 1,
    max_interval: int = 64,
    default_interval: int = 8,
) -> DataFrame:
    """Next revisit round per URL, from the full visit history.

    ``interval = clamp(target / change_rate, min, max)`` — a page
    expected to change every 2 rounds with target 0.5 is revisited
    every round; a page that never changed drifts to ``max_interval``.
    URLs without rate evidence (single visit) get
    ``default_interval``. Returns::

        (*key, n_changes, n_intervals, change_rate, interval, next_due)

    ``next_due`` is in the same round units as ``round_id``; the
    engine turns ``fetched`` frontier rows with ``next_due <=
    current_round`` back into revisit candidates (CrawlEngine.revisit).
    """
    keys = key_cols or ["url_hash"]
    return _schedule(
        change_rates(history, keys),
        keys,
        target,
        min_interval,
        max_interval,
        default_interval,
    )


def update_revisit_stats(
    stats: DataFrame | None,
    visits: DataFrame,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Merge ONE round's visits into the per-URL stats table
    (incremental form of :func:`change_rates`'s aggregation).

    ``visits``: (*key, round_id, fingerprint), at most one row per key
    (a round fetches a URL at most once) and every ``round_id``
    strictly greater than any round already merged. ``stats`` is the
    previous snapshot (None bootstraps). The merge is a full-outer
    join on the key — budget-proportional on the visit side, never a
    history rescan.
    """
    keys = key_cols or ["url_hash"]
    if stats is None:
        return visits.select(
            *keys,
            F.lit(1).cast("long").alias("n_visits"),
            F.lit(0).cast("long").alias("n_intervals"),
            F.lit(0).cast("long").alias("n_changes"),
            F.col("round_id").alias("first_round"),
            F.col("round_id").alias("last_round"),
            F.col("fingerprint").alias("last_fp"),
        )
    v = visits.select(
        *keys,
        F.col("round_id").alias("v_round"),
        F.col("fingerprint").alias("v_fp"),
    )
    visited = F.col("v_round").isNotNull()
    known = F.col("n_visits").isNotNull()
    return (
        stats.join(v, keys, "full_outer")
        .select(
            *keys,
            F.when(
                visited & known, F.col("n_visits") + 1
            )
            .when(known, F.col("n_visits"))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("n_visits"),
            F.when(
                visited & known, F.col("n_intervals") + 1
            )
            .when(known, F.col("n_intervals"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("n_intervals"),
            (
                F.coalesce("n_changes", F.lit(0))
                + F.when(
                    visited & known & (F.col("v_fp") != F.col("last_fp")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_changes"),
            F.coalesce("first_round", "v_round").alias("first_round"),
            F.coalesce("v_round", "last_round").alias("last_round"),
            F.coalesce("v_fp", "last_fp").alias("last_fp"),
        )
    )


def schedule_from_stats(
    stats: DataFrame,
    policy: RevisitPolicy | None = None,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """The revisit schedule as pure column arithmetic over a stats
    snapshot — no shuffle at all (the stats table is already keyed).
    Same output contract as :func:`revisit_schedule`."""
    pol = policy or RevisitPolicy()
    keys = key_cols or ["url_hash"]
    rates = stats.select(
        *keys,
        "n_changes",
        "n_intervals",
        "last_round",
        _rate_expr().alias("change_rate"),
    )
    return _schedule(
        rates,
        keys,
        pol.target,
        pol.min_interval,
        pol.max_interval,
        pol.default_interval,
    )
