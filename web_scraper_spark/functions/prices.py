"""Price/string/date scalar functions (ops P5-P11) — pure Columns.

Each mirrors a reference scalar exactly (citations into
/root/reference/); all are native expressions inside whole-stage
codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "parse_price",
    "is_valid_price_text",
    "format_currency_col",
    "format_date_for_api",
    "epoch_millis",
    "strip_company_suffix",
    "durum_flag",
]


def parse_price(c: Column) -> Column:
    """P5 — ``"1.234,56" → 1234.56``; empty/invalid → 0.0
    (src/api/routes/price.py:26-33: strip '.' thousands, ','→'.')."""
    normalized = F.regexp_replace(F.regexp_replace(c, r"\.", ""), ",", ".")
    # try_cast: ANSI-mode-safe (invalid → NULL → 0.0, like the reference's
    # except ValueError branch)
    return F.coalesce(normalized.try_cast("double"), F.lit(0.0))


def is_valid_price_text(c: Column) -> Column:
    """F4 — price-text sanity predicate (mmk_tracker.py:196-203):
    accept a candidate price string only if it starts with a digit and
    does not contain 'NaN' (``re.search(r'^\\d', text) and 'NaN' not in
    text``). Python 3's ``\\d`` matches any Unicode decimal digit (Nd),
    so the gate uses ``\\p{Nd}`` — supported identically by the JVM
    regex engine and by DuckDB's RE2 oracle. NULL-safe: NULL → invalid."""
    return F.coalesce(
        c.rlike(r"^\p{Nd}") & ~c.contains("NaN"), F.lit(False)
    )


def format_currency_col(c: Column) -> Column:
    """P6 — float → ``"1.234,56"`` (mmk_tracker.py:31-39: US format then
    swap ',' and '.'). ``format_number`` gives the US form; ``translate``
    swaps separators in one pass."""
    return F.translate(F.format_number(c.cast("double"), 2), ",.", ".,")


def format_date_for_api(c: Column) -> Column:
    """P7 — ``"%Y-%m-%d %H:%M:%S" → "%d.%m.%Y %H:%M"``
    (nausys_tracker.py:443-450)."""
    return F.date_format(
        F.to_timestamp(c, "yyyy-MM-dd HH:mm:ss"), "dd.MM.yyyy HH:mm"
    )


def epoch_millis(c: Column) -> Column:
    """P8 — datetime → epoch millis (mmk_tracker.py:171-172).

    ``unix_millis`` keeps sub-second precision (``unix_timestamp`` would
    truncate to seconds); the cast also lifts TIMESTAMP_NTZ parquet reads
    into the session (UTC) timeline first.
    """
    return F.unix_millis(c.cast("timestamp"))


def strip_company_suffix(c: Column) -> Column:
    """P9 — ``company_name.replace(" Turizm", "")``
    (mmk_tracker.py:152-153)."""
    return F.regexp_replace(c, r" Turizm", "")


def durum_flag(diff: Column) -> Column:
    """P11 — 3-way status flag (price.py:127-132)."""
    return (
        F.when(diff < 0, F.lit(0)).when(diff > 0, F.lit(1)).otherwise(F.lit(2))
    )
