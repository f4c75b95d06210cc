"""Focused-crawl scoring (operators/focus.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_scraper_spark.operators.focus import focus_scores


def _disc(spark, rows):
    return spark.createDataFrame(
        rows, "parent_url string, url string, anchor_text string"
    )


def _scores(spark, rows):
    return spark.createDataFrame(rows, "url string, score double")


def test_inherited_plus_anchor(spark):
    disc = _disc(
        spark,
        [
            ("p1", "c1", "yacht charter prices"),  # 2/2 topic terms
            ("p2", "c2", "about us"),  # 0 topic terms
            (None, "c3", "Yacht  YACHT charter"),  # dup terms, no parent
        ],
    )
    parents = _scores(spark, [("p1", 0.8), ("p2", 1.0)])
    out = {
        r.url: r.focus_score
        for r in focus_scores(
            disc, parents, ["charter", "yacht"], decay=0.5, gamma=0.7
        ).collect()
    }
    assert out["c1"] == pytest.approx(0.7 * 0.5 * 0.8 + 0.3 * 1.0)
    assert out["c2"] == pytest.approx(0.7 * 0.5 * 1.0)
    # case-folded, deduped anchor terms; missing parent scores as 0
    assert out["c3"] == pytest.approx(0.3 * 1.0)


def test_best_parent_wins(spark):
    disc = _disc(spark, [("hi", "c", ""), ("lo", "c", "yacht")])
    parents = _scores(spark, [("hi", 1.0), ("lo", 0.0)])
    out = focus_scores(disc, parents, ["yacht"]).collect()
    assert len(out) == 1
    # max(0.35 from hi-parent, 0.3 from anchor) = 0.35
    assert out[0].focus_score == pytest.approx(0.35)


def test_rejects_empty_topic(spark):
    with pytest.raises(ValueError):
        focus_scores(_disc(spark, []), _scores(spark, []), [])


def test_no_python_udf(spark):
    disc = _disc(spark, [("p", "c", "x")])
    plan = (
        focus_scores(disc, _scores(spark, [("p", 1.0)]), ["x"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
