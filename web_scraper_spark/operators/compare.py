"""The read-side price-comparison query (§3.3; op J3/J4/J5 + P5/P10/P11).

Reference: GET /api/v1/prices/compare (src/api/routes/price.py:36-150) —
two latest-doc point lookups, dict-merge over the union of period keys,
per-row ``parse_price`` + diff/abs/flag, sorted output. Re-expressed as
one declarative plan, zero custom code:

    latest-per-key (window row_number)      — J5, price.py:52-66
    full-outer join on (period_from, period_to) — J3, price.py:85-96
    first-detail element semantics          — J4 (element_at), price.py:76,83
    parse_price / diff / fark / durum       — P5/P10/P11, price.py:114-132
    orderBy period keys                     — A5, price.py:87
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.prices import durum_flag, parse_price

__all__ = ["latest_extraction", "compare_prices"]


def latest_extraction(extractions: DataFrame, competitor: str, yacht_id: str) -> DataFrame:
    """J5 — latest round's rows for one (competitor, yacht_id), like
    ``find_one(sort=[("last_update_date", -1)])``
    (booking_data_repository.py:66-82)."""
    filtered = extractions.filter(
        (F.col("competitor") == competitor) & (F.col("yacht_id") == yacht_id)
    )
    w = Window.partitionBy("period_from", "period_to").orderBy(
        F.col("round_id").desc()
    )
    return (
        filtered.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def compare_prices(
    extractions: DataFrame,
    competitor_name: str,
    yacht_id: str,
    our_name: str,
    our_yacht_id: str,
) -> DataFrame:
    """Full price-comparison table, reference-shaped output columns."""
    comp = latest_extraction(extractions, competitor_name, yacht_id).select(
        "period_from",
        "period_to",
        F.col("details").alias("comp_details"),
    )
    ours = latest_extraction(extractions, our_name, our_yacht_id).select(
        "period_from",
        "period_to",
        F.col("details").alias("our_details"),
    )

    joined = comp.join(ours, ["period_from", "period_to"], "full_outer")

    def det(side: str, field: str):  # missing side → '' like `.get(...,"")`
        return F.coalesce(F.col(side)[field], F.lit(""))

    rakip_fiyat = parse_price(det("comp_details", "total_price"))
    bizim_fiyat = parse_price(det("our_details", "total_price"))
    diff = bizim_fiyat - rakip_fiyat

    return (
        joined.select(
            F.concat_ws(" - ", "period_from", "period_to").alias("tarih"),
            F.col("period_from"),
            F.col("period_to"),
            det("our_details", "port_from").alias("bizim_konum"),
            det("comp_details", "port_from").alias("rakip_konum"),
            bizim_fiyat.alias("bizim_fiyat"),
            rakip_fiyat.alias("rakip_fiyat"),
            parse_price(det("comp_details", "list_price")).alias("rakip_list_price"),
            det("comp_details", "discount_name").alias("discount_type"),
            det("comp_details", "discount_percent").alias("discount_percentage"),
            det("comp_details", "commission_percent").alias("commission_percentage"),
            parse_price(det("comp_details", "commission")).alias("commission"),
            F.abs(diff).alias("fark"),
            durum_flag(diff).alias("durum"),
        )
        .orderBy("period_from", "period_to")
    )
