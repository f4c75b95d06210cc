"""Unicode normalization: NFC composition, accent stripping, and the
dedup-key property (visually-identical spellings collapse)."""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from web_scraper_spark.functions.unicode_norm import (
    nfc,
    normalize_text,
    strip_accents,
)


def test_nfc_composes_combining_sequences(spark):
    decomposed = "Cafe" + chr(0x0301)  # e + combining acute
    composed = "Café"
    assert decomposed != composed  # distinct byte strings…
    df = spark.createDataFrame([(decomposed,), (composed,)], "t string")
    vals = {r.v for r in df.select(nfc(F.col("t")).alias("v")).collect()}
    assert vals == {composed}  # …one spelling after NFC


def test_strip_accents(spark):
    df = spark.createDataFrame(
        [("Été naïve über",)], "t string"
    )
    (row,) = df.select(strip_accents(F.col("t")).alias("v")).collect()
    assert row.v == "Ete naive uber"


def test_normalize_text_dedup_key_property(spark):
    """All spellings of the same visible text produce one key."""
    variants = [
        "Café  Menu",
        "Cafe" + chr(0x0301) + " \t Menu",
        "CAFÉ MENU",
        " café menu ",
    ]
    df = spark.createDataFrame([(v,) for v in variants], "t string")
    keys = {
        r.k
        for r in df.select(
            normalize_text(F.col("t"), accents=False).alias("k")
        ).collect()
    }
    assert keys == {"café menu"}
    ascii_keys = {
        r.k
        for r in df.select(
            normalize_text(F.col("t"), accents=True).alias("k")
        ).collect()
    }
    assert ascii_keys == {"cafe menu"}


def test_null_and_idempotence(spark):
    df = spark.createDataFrame([(None,), ("plain ascii",)], "t string")
    rows = {
        r.t: r.k
        for r in df.select(
            "t", normalize_text(F.col("t")).alias("k")
        ).collect()
    }
    assert rows[None] is None
    assert rows["plain ascii"] == "plain ascii"
    # applying twice changes nothing (normalization is idempotent)
    once = normalize_text(F.col("t"), accents=True)
    df2 = spark.createDataFrame([("ÉTÉ   x",)], "t string")
    (row,) = df2.select(
        once.alias("a"),
        normalize_text(once, accents=True).alias("b"),
    ).collect()
    assert row.a == row.b == "ete x"


def test_matches_python_reference(spark):
    """Engine output ≡ direct unicodedata reference on mixed samples."""
    samples = [
        "straße",  # ß is NOT an accent: survives strip, lowers as-is
        "İstanbul",  # dotted capital I
        "Å rhus",  # A + combining ring
        "ﬁle",  # fi ligature (NFC keeps it; not an accent)
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = {
        r.t: r.k
        for r in df.select(
            "t", normalize_text(F.col("t"), accents=True).alias("k")
        ).collect()
    }
    for s in samples:
        n = unicodedata.normalize("NFC", s)
        stripped = "".join(
            ch
            for ch in unicodedata.normalize("NFD", n)
            if unicodedata.category(ch) != "Mn"
        )
        import re

        want = re.sub(r"\s+", " ", stripped.lower()).strip()
        assert got[s] == want, s
