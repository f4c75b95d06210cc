"""Token-window chunking and soft-404 detection."""

from __future__ import annotations

import pytest

from web_scraper_spark.operators.chunking import chunk_documents
from web_scraper_spark.operators.soft404 import detect_soft404

# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------


def _chunks(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = chunk_documents(df, **kw).collect()
    return sorted(
        ((r["doc_id"], r["chunk_id"], r["chunk_start"], r["chunk_len"], r["chunk_text"]) for r in out)
    )


def test_exact_multiple_no_overlap(spark):
    text = " ".join(f"t{i}" for i in range(8))
    got = _chunks(spark, [(1, text)], chunk_tokens=4, overlap_tokens=0)
    assert got == [
        (1, 0, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 4, 4, "t4 t5 t6 t7"),
    ]


def test_trailing_short_chunk_clamped(spark):
    text = " ".join(f"t{i}" for i in range(10))
    got = _chunks(spark, [(1, text)], chunk_tokens=4, overlap_tokens=0)
    assert got[-1] == (1, 2, 8, 2, "t8 t9")


def test_overlap_stride(spark):
    text = " ".join(f"t{i}" for i in range(10))
    got = _chunks(spark, [(1, text)], chunk_tokens=4, overlap_tokens=2)
    # stride 2: starts 0,2,4,6,8
    assert [(c[2], c[4]) for c in got] == [
        (0, "t0 t1 t2 t3"),
        (2, "t2 t3 t4 t5"),
        (4, "t4 t5 t6 t7"),
        (6, "t6 t7 t8 t9"),
        (8, "t8 t9"),
    ]
    # consecutive chunks share exactly `overlap` tokens
    assert got[0][4].split()[-2:] == got[1][4].split()[:2]


def test_every_token_covered_once_per_stride(spark):
    text = " ".join(f"t{i}" for i in range(57))
    got = _chunks(spark, [(1, text)], chunk_tokens=16, overlap_tokens=4)
    covered = set()
    for _, _, start, length, _ in got:
        covered.update(range(start, start + length))
    assert covered == set(range(57))


def test_empty_and_whitespace_docs_produce_no_chunks(spark):
    got = _chunks(
        spark, [(1, ""), (2, "   "), (3, "one two")], chunk_tokens=4, overlap_tokens=0
    )
    assert got == [(3, 0, 0, 2, "one two")]


def test_short_doc_single_chunk(spark):
    got = _chunks(spark, [(1, "a b c")], chunk_tokens=128, overlap_tokens=32)
    assert got == [(1, 0, 0, 3, "a b c")]


def test_bad_params_rejected(spark):
    df = None
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap_tokens=8)


def test_chunking_plan_has_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id BIGINT, text STRING")
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure in-row explode, zero shuffles


# ---------------------------------------------------------------------------
# soft-404
# ---------------------------------------------------------------------------

ERR = "Sorry, this page could not be found. Error 404."


def _flags(spark, rows, **kw):
    df = spark.createDataFrame(rows, "host STRING, url STRING, text STRING")
    out = detect_soft404(df, **kw).collect()
    return {r["url"]: (r["soft404_score"], r["is_soft404"]) for r in out}


def test_template_plus_phrase_flags(spark):
    rows = [("h1", f"u{i}", ERR) for i in range(3)] + [("h1", "ok", "real content " * 10)]
    got = _flags(spark, rows, min_template_pages=3)
    # phrase(2) + template(2) = 4 >= 3 (ERR body is 8 tokens < 15 → +1 = 5)
    assert got["u0"] == (5, True)
    assert got["ok"] == (0, False)


def test_tiny_alone_does_not_flag(spark):
    got = _flags(spark, [("h1", "u1", "gone away")])
    assert got["u1"] == (1, False)


def test_phrase_plus_tiny_flags_without_template(spark):
    got = _flags(spark, [("h1", "u1", "error 404")])
    assert got["u1"] == (3, True)


def test_unique_long_page_mentioning_404_not_flagged(spark):
    prose = "a thorough essay about how 404 pages should be designed " * 3
    got = _flags(spark, [("h1", "u1", prose)])
    assert got["u1"] == (2, False)  # phrase alone scores 2 < 3


def test_template_count_is_per_host(spark):
    rows = [("h1", "a1", ERR), ("h1", "a2", ERR), ("h2", "b1", ERR)]
    got = _flags(spark, rows, min_template_pages=2)
    assert got["a1"][1] and got["a2"][1]
    # h2 has only one copy → no template signal, but phrase+tiny still flags
    assert got["b1"] == (3, True)
