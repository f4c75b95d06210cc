"""Task-period generators (ops T1/T2) as pure Column expressions.

T1 (weekly 17:00→+7d 08:00 pairs) lives in ``plans.rounds.init_frontier``;
this module adds the MMK tracker's generator family:

T2 — next-Saturday alignment + 180-day horizon
(/root/reference/src/core/tracker/mmk_tracker.py:115-120):

    days_ahead = 5 - today.weekday()   # Mon=0 … Sun=6
    if days_ahead < 0: days_ahead += 7
    next_saturday = today + days_ahead # NOTE: a Saturday maps to ITSELF

then weekly [start, start+7d) pairs while ``start < next_saturday +
horizon_days`` (mmk_tracker.py:166-172), each bound rendered as epoch
millis at midnight (mmk_tracker.py:171-172) — P8's consumer.

``F.next_day(d, 'Sat')`` is strictly-after (Saturday → +7), so the
Saturday-maps-to-itself rule is built from ``weekday()`` arithmetic
instead, mirroring the reference exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["next_saturday", "mmk_weekly_periods"]


def next_saturday(d: Column) -> Column:
    """T2 — the reference's ``5 - weekday`` jump: the next Saturday on
    or after ``d`` for Mon-Sat, the Saturday 6 days out for a Sunday."""
    wd = F.weekday(d)  # Monday = 0 … Sunday = 6, same as Python
    days_ahead = F.when(wd == 6, F.lit(6)).otherwise(F.lit(5) - wd)
    return F.date_add(d, days_ahead)


def mmk_weekly_periods(
    base_dates: DataFrame,
    base_col: str = "base_date",
    horizon_days: int = 180,
) -> DataFrame:
    """T2 — per base date: weekly periods from ``next_saturday(base)``
    through a ``horizon_days`` horizon.

    Output: (base_date, period_idx, date_from, date_to, date_from_ms,
    date_to_ms) — one row per week, ``date_to = date_from + 7d``,
    millis at midnight of each bound (the reference's
    ``time.mktime(dt.timetuple()) * 1000`` with the session clock fixed
    to UTC). The weekly loop ``while current < start + horizon`` is a
    ``sequence`` to ``start + horizon - 1`` (steps of 7 days: strictly
    below the horizon ⟺ at most horizon-1).

    Scale shape: generator only — ``sequence`` + one ``explode``, no
    shuffle; downstream task expansion cross-joins it broadcast-side
    exactly like T1.
    """
    start = next_saturday(F.col(base_col))
    starts = F.sequence(
        start, F.date_add(start, horizon_days - 1), F.expr("interval 7 days")
    )
    exploded = base_dates.select(
        F.col(base_col).alias("base_date"),
        F.posexplode(starts).alias("period_idx", "d_from"),
    )
    return exploded.select(
        "base_date",
        "period_idx",
        F.col("d_from").alias("date_from"),
        F.date_add("d_from", 7).alias("date_to"),
        F.unix_millis(F.col("d_from").cast("timestamp")).alias("date_from_ms"),
        F.unix_millis(F.date_add("d_from", 7).cast("timestamp")).alias("date_to_ms"),
    )
