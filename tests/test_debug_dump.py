"""W5 debug dump: capped JSON snapshot of a DataFrame (SURVEY §2 W5;
reference prints json.dumps of its result dict, mmk_tracker.py:341)."""

import json

import pytest

from web_scraper_spark.plans.debug import debug_dump


def test_debug_dump_roundtrips_rows_and_schema(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "id int, name string"
    )
    out = tmp_path / "dump.json"
    text = debug_dump(df.orderBy("id"), path=str(out), limit=10)
    payload = json.loads(text)
    assert payload["truncated"] is False
    assert payload["schema"] == "struct<id:int,name:string>"
    assert payload["results"] == [
        {"id": 1, "name": "a"},
        {"id": 2, "name": "b"},
        {"id": 3},  # toJSON drops null fields — absence encodes NULL
    ]
    assert json.loads(out.read_text()) == payload


def test_debug_dump_caps_rows_and_flags_truncation(spark):
    df = spark.range(1000)
    payload = json.loads(debug_dump(df, limit=5))
    assert len(payload["results"]) == 5
    assert payload["truncated"] is True


def test_debug_dump_rejects_nonpositive_limit(spark):
    with pytest.raises(ValueError):
        debug_dump(spark.range(1), limit=0)
