"""C4 + Gopher published-pipeline filters (operators/docfilters.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_scraper_spark.operators.docfilters import c4_clean, gopher_stats


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_c4_line_rules(spark):
    text = (
        "this is a fine long sentence here.\n"
        "too short.\n"
        "this long line has no terminal punctuation at all\n"
        "another quite long proper sentence ends here!\n"
        'a quoted sentence can end in a quote."\n'
        "   \n"
        "the third full sentence closes the document."
    )
    out = c4_clean(_docs(spark, [text])).collect()[0]
    assert out.n_lines_kept == 4
    assert out.n_lines_dropped == 2  # blank lines aren't counted at all
    assert out.c4_keep is True
    assert "too short" not in out.clean_text
    assert "no terminal punctuation" not in out.clean_text


def test_c4_doc_rules(spark):
    good = "this is a fine long sentence here.\n" * 3
    lorem = good + "the page is full of lorem ipsum filler content today.\n"
    brace = good + "the snippet shows function body { x } in full detail.\n"
    short = "this is a fine long sentence here.\n" * 2
    rows = c4_clean(_docs(spark, [good, lorem, brace, short])).collect()
    keeps = [r.c4_keep for r in sorted(rows, key=lambda r: r.doc_id)]
    assert keeps == [True, False, False, False]


def test_c4_badwords(spark):
    text = "this sentence mentions contraband items for sale today.\n" * 3
    ok = c4_clean(_docs(spark, [text]), badwords=[]).collect()[0]
    hit = c4_clean(_docs(spark, [text]), badwords=["Contraband"]).collect()[0]
    assert ok.c4_keep is True and hit.c4_keep is False


def test_gopher_stats_and_verdict(spark):
    base = "the yacht and the crew have sailed to port of call.\n" * 6
    bullets = base + "- one\n- two\n" * 10  # bullet_frac high but <=0.9
    hashes = base + "#a #b #c #d #e #f #g #h #i #j #k #l #m #n #o #p"
    tiny = "the cat sat."  # n_words < 50
    rows = {
        r.doc_id: r
        for r in gopher_stats(
            _docs(spark, [base, bullets, hashes, tiny])
        ).collect()
    }
    assert rows[0].n_words == 66
    assert rows[0].mean_word_len == pytest.approx(41 / 11)
    assert rows[0].stopword_hits == 5
    assert rows[0].gopher_keep is True
    assert rows[1].bullet_line_frac == pytest.approx(20 / 26)
    assert rows[1].alpha_word_frac < 1.0  # "-" tokens have no alpha
    assert rows[2].symbol_ratio == pytest.approx(16 / (66 + 16))
    assert rows[2].gopher_keep is False  # symbol ratio > 0.1
    assert rows[3].gopher_keep is False  # too few words
    assert rows[3].n_words == 3


def test_no_python_udf(spark):
    df = _docs(spark, ["a line of text ends here.\nanother one does too."])
    for out in (c4_clean(df), gopher_stats(df)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
