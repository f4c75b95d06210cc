"""Cross-document duplicate-span (exact-substring) removal."""

from __future__ import annotations

from web_scraper_spark.operators.spandedup import strip_duplicate_spans

PROMO = "subscribe now for daily updates today"  # 6 tokens


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def _clean(spark, rows, window=6):
    out = strip_duplicate_spans(_docs(spark, rows), window=window)
    return {r["doc_id"]: (r["clean_text"], r["n_removed"]) for r in out.collect()}


def test_shared_span_kept_only_in_min_doc(spark):
    rows = [
        (1, f"alpha beta gamma {PROMO}"),
        (2, f"delta epsilon zeta {PROMO}"),
        (3, f"eta theta iota {PROMO}"),
    ]
    got = _clean(spark, rows)
    assert got[1] == (f"alpha beta gamma {PROMO}", 0)  # owner keeps it
    assert got[2] == ("delta epsilon zeta", 6)
    assert got[3] == ("eta theta iota", 6)


def test_short_doc_untouched(spark):
    got = _clean(spark, [(1, "only three tokens"), (2, "only three tokens")])
    assert got[1] == ("only three tokens", 0)
    assert got[2] == ("only three tokens", 0)  # < window: no hashes at all


def test_fully_duplicated_doc_becomes_empty(spark):
    rows = [(1, PROMO), (2, PROMO)]
    got = _clean(spark, rows)
    assert got[1] == (PROMO, 0)
    assert got[2] == ("", 6)


def test_overlapping_windows_merge(spark):
    # doc 2 contains a 8-token copy -> 3 overlapping dup windows whose
    # covered positions must union, not double-count
    span = "one two three four five six seven eight"
    rows = [(1, f"x {span}"), (2, f"pre text {span} post")]
    got = _clean(spark, rows)
    assert got[2] == ("pre text post", 8)


def test_within_owner_repeats_kept(spark):
    rows = [(1, f"{PROMO} filler words {PROMO}"), (5, "unrelated words entirely here now ok")]
    got = _clean(spark, rows)
    assert got[1][1] == 0  # min-id owner keeps both copies
