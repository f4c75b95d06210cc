"""Line-level boilerplate dedup + PII scrubbing unit behavior.

The battery rows (`line_dedup`, `pii_scrub`) pin engine≡DuckDB at
corpus scale; these tests pin the EDGES on hand-built documents:
blank-line preservation, all-boilerplate docs, whitespace-normalized
line identity, PII replacement order and boundary behavior.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from web_scraper_spark.functions.textstats import pii_counts, scrub_pii
from web_scraper_spark.operators.linededup import (
    boilerplate_lines,
    strip_boilerplate,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BP = "Home | Products"  # appears in all 3 docs below


def test_boilerplate_detected_with_whitespace_noise(spark):
    docs = _docs(
        spark,
        [
            (1, f"{BP}\nunique one"),
            (2, f"  home   |  products \nunique two"),  # case+ws variant
            (3, f"{BP}\nunique three"),
        ],
    )
    bp = boilerplate_lines(docs, min_docs=3).collect()
    assert len(bp) == 1
    assert bp[0]["n_docs"] == 3
    # sample is the lexicographic-min RAW form
    assert bp[0]["sample_line"] == "  home   |  products "


def test_strip_preserves_order_blanks_and_bytes(spark):
    docs = _docs(
        spark,
        [
            (1, f"{BP}\nfirst  line\n\nsecond line"),
            (2, f"{BP}\nother"),
            (3, f"{BP}\nmore"),
        ],
    )
    out = {r["doc_id"]: r for r in strip_boilerplate(docs, min_docs=3).collect()}
    # blank line survives (structure), inner double-space survives (bytes)
    assert out[1]["text"] == "first  line\n\nsecond line"
    assert out[1]["n_lines"] == 4 and out[1]["n_removed"] == 1
    assert out[2]["text"] == "other"


def test_all_boilerplate_doc_survives_empty(spark):
    docs = _docs(spark, [(1, BP), (2, BP), (3, BP), (4, f"{BP}\nkeep")])
    out = {r["doc_id"]: r for r in strip_boilerplate(docs, min_docs=3).collect()}
    assert out[1]["text"] == "" and out[1]["n_removed"] == 1
    assert out[4]["text"] == "keep"


def test_below_threshold_lines_kept(spark):
    docs = _docs(spark, [(1, "rare\na"), (2, "rare\nb"), (3, "c")])
    out = {r["doc_id"]: r for r in strip_boilerplate(docs, min_docs=3).collect()}
    assert out[1]["text"] == "rare\na"  # only 2 docs share it


def test_pii_scrub_order_and_counts(spark):
    text = (
        "mail bob.smith+x@corp.example.org early, "
        "server 192.168.1.250 up, call +90 532 1234567 now"
    )
    df = spark.range(1).select(F.lit(text).alias("text"))
    c = pii_counts(F.col("text"))
    row = df.select(
        c["n_emails"].alias("e"),
        c["n_ips"].alias("i"),
        c["n_phones"].alias("p"),
        scrub_pii(F.col("text")).alias("out"),
    ).first()
    assert (row["e"], row["i"], row["p"]) == (1, 1, 1)
    assert row["out"] == (
        "mail <EMAIL> early, server <IP> up, call <PHONE> now"
    )


def test_pii_scrub_no_false_positives(spark):
    # version strings and bare numbers must survive: 1.2.3 (three
    # octets only), v10.0.0.1beta (no word boundary after), a@b (no TLD)
    text = "release 1.2.3 and v10.0.0.1beta plus a@b stay"
    row = (
        spark.range(1)
        .select(scrub_pii(F.lit(text)).alias("out"))
        .first()
    )
    assert row["out"] == text
