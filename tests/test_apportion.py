"""Largest-remainder budget apportionment: quota rule, exact-sum, caps."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from web_scraper_spark.operators.apportion import allocate_budget


def _w(spark, rows):
    return spark.createDataFrame(rows, "host string, priority double")


def test_allocation_sums_exactly_and_respects_quota(spark):
    rows = [(f"h{i}", float(1 + (i * 7) % 13)) for i in range(50)]
    total = 997  # prime: forces a non-trivial remainder distribution
    out = allocate_budget(_w(spark, rows), total).collect()
    assert sum(r["allocation"] for r in out) == total
    wsum = sum(w for _, w in rows)
    for r in out:
        ideal = total * dict(rows)[r["host"]] / wsum
        assert math.floor(ideal) <= r["allocation"] <= math.ceil(ideal), (
            r["host"], ideal, r["allocation"],
        )


def test_zero_weight_gets_zero_and_ties_deterministic(spark):
    rows = [("a", 0.0), ("b", 1.0), ("c", 1.0), ("d", 1.0)]
    out = {r["host"]: r["allocation"] for r in
           allocate_budget(_w(spark, rows), 4).collect()}
    assert out["a"] == 0
    # 4 * (1/3) = 1.333... -> bases 1,1,1; leftover 1 goes to the
    # tied-remainder host first in key order
    assert out == {"a": 0, "b": 2, "c": 1, "d": 1}
    again = {r["host"]: r["allocation"] for r in
             allocate_budget(_w(spark, rows), 4).collect()}
    assert again == out


def test_cap_clamps_without_redistribution(spark):
    df = spark.createDataFrame(
        [("a", 9.0, 2), ("b", 1.0, 100)],
        "host string, priority double, cap int",
    )
    out = {r["host"]: r["allocation"] for r in
           allocate_budget(df, 10, cap_col="cap").collect()}
    assert out == {"a": 2, "b": 1}  # a clamped 9 -> 2; surplus NOT moved


def test_rejects_bad_weights(spark):
    with pytest.raises(ValueError):
        allocate_budget(_w(spark, [("a", -1.0), ("b", 2.0)]), 5)
    with pytest.raises(ValueError):
        allocate_budget(_w(spark, [("a", 0.0)]), 5)
