"""JSON listing source + enrichment join (ops S3/T4).

The reference's second source type is a JSON listing endpoint
(/root/reference/src/core/tracker/mmk_tracker.py:126-137): each
competitor GET returns ``{"boats": [{id, baseId, product: [{id}],
fullName, company, base, deposit}, ...]}``; each seed yacht is then
looked up in that array by id and enriched with per-field defaults
(mmk_tracker.py:145-163).

Spark-first re-expression:

- S3: ``from_json`` with an explicit schema + ``explode(boats)`` — one
  narrow projection per boat row; malformed payloads yield NULL (the
  reference's ``except: continue`` branch) instead of killing the job.
- T4: the per-yacht ``next(b for b in boats if b.id == yacht_id)``
  linear scan becomes a broadcast left equi-join on the boat id, and
  every ``boat_data.get(k, default)`` becomes ``coalesce`` — including
  the no-match row (all boat columns NULL → all defaults), which is
  exactly the reference's ``else`` branch.

Scale: listings are one payload per competitor (small side) → broadcast;
the task side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from ..functions.prices import strip_company_suffix

__all__ = ["BOATS_SCHEMA", "parse_boats_json", "enrich_listings"]

BOATS_SCHEMA = StructType(
    [
        StructField(
            "boats",
            ArrayType(
                StructType(
                    [
                        StructField("id", StringType()),
                        StructField("baseId", StringType()),
                        StructField(
                            "product",
                            ArrayType(
                                StructType([StructField("id", StringType())])
                            ),
                        ),
                        StructField("fullName", StringType()),
                        StructField("company", StringType()),
                        StructField("base", StringType()),
                        StructField("deposit", DoubleType()),
                    ]
                )
            ),
        )
    ]
)


def parse_boats_json(df: DataFrame, json_col: str = "listing_json") -> DataFrame:
    """S3 — one row per boat from a JSON listing payload.

    Input: (competitor, <json_col>); output: (competitor, boat struct
    columns). A payload without a ``boats`` array (or unparseable JSON —
    ``from_json`` yields NULL, never throws) simply contributes no rows,
    mirroring mmk_tracker.py:128-137's continue branches.
    """
    parsed = df.withColumn("__p", F.from_json(F.col(json_col), BOATS_SCHEMA))
    return (
        parsed.filter(F.col("__p.boats").isNotNull())
        .select("competitor", F.explode("__p.boats").alias("boat"))
        .select(
            "competitor",
            F.col("boat.id").alias("boat_id"),
            F.col("boat.baseId").alias("base_id"),
            F.col("boat.product").alias("product"),
            F.col("boat.fullName").alias("full_name"),
            F.col("boat.company").alias("company"),
            F.col("boat.base").alias("port"),
            F.col("boat.deposit").alias("deposit"),
        )
    )


def enrich_listings(
    tasks: DataFrame,
    boats: DataFrame,
    default_base_id: str = "",
    default_product: str = "Bareboat",
) -> DataFrame:
    """T4 — enrich (competitor, yacht_name, yacht_id) tasks with their
    listing boat, falling back per field (mmk_tracker.py:145-163):

    - resource_id   = boat.id               | yacht_id
    - base_id       = boat.baseId           | default_base_id
    - product_id    = boat.product[0].id    | 'Bareboat'
    - yacht_fullname= boat.fullName         | yacht_name
    - company_name  = boat.company          | competitor, then the
      ' Turizm' suffix strip (P9)
    - port          = boat.base             | ''
    - deposit       = boat.deposit          | 0.0
    """
    joined = tasks.join(
        F.broadcast(boats),
        (tasks.yacht_id == boats.boat_id) & (tasks.competitor == boats.competitor),
        "left",
    ).drop(boats.competitor)
    return joined.select(
        "competitor",
        "yacht_name",
        "yacht_id",
        F.coalesce("boat_id", "yacht_id").alias("resource_id"),
        F.coalesce("base_id", F.lit(default_base_id)).alias("base_id"),
        F.coalesce(
            F.try_element_at("product", F.lit(1))["id"], F.lit(default_product)
        ).alias("product_id"),
        F.coalesce("full_name", "yacht_name").alias("yacht_fullname"),
        # the strip applies to boat_data.get('company', competitor_name) —
        # i.e. whenever the boat MATCHED, even if its 'company' key is
        # absent; only the no-match branch keeps the competitor verbatim
        # (mmk_tracker.py:152-154 vs :161)
        F.when(
            F.col("boat_id").isNotNull(),
            strip_company_suffix(F.coalesce(F.col("company"), F.col("competitor"))),
        )
        .otherwise(F.col("competitor"))
        .alias("company_name"),
        F.coalesce("port", F.lit("")).alias("port"),
        F.coalesce("deposit", F.lit(0.0)).alias("deposit"),
    )
