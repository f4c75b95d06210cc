"""Round-4 published-pipeline filter battery: C4 (Raffel et al. 2020)
and Gopher (Rae et al. 2021 App. A1.1) document filters.

Both entries synthesize structured multi-line text DETERMINISTICALLY
from doc_id on both engines (the parquet `documents` text is flat
word-soup without lines or punctuation, so line- and sentence-level
rules need constructed input — same convention as battery_web's
synthetic URL families). The oracle states per-document stats and
verdicts in CLOSED FORM over the generating parameters (family = doc_id
mod k, repeat counts), never re-running the rules — so tokenization,
line-splitting, sentence-counting, or threshold bugs in the engine
break the hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.docfilters import c4_clean, gopher_stats
from .battery import T, q

_GOOD = "the yacht sailed to the port today."
_LOREM = "the data uses lorem ipsum filler text today."
_BRACE = "function body { return value } end of code."
_BASE = "the yacht and the crew have sailed to port of call."
_BULLET = "- marina dock berth quay wharf."
_ELLIP = "voyage continues onward..."
_HASH = "#a #b #c #d #e #f #g"


@q(
    "c4_filters",
    f"""
    WITH p AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 2 THEN 2
                  ELSE (doc_id % 3) + 3 END AS m,
             doc_id % 5 AS fam
      FROM documents
    )
    SELECT doc_id,
           (m + CASE WHEN fam IN (0, 1) THEN 1 ELSE 0 END)::BIGINT
             AS n_lines_kept,
           2::BIGINT AS n_lines_dropped,
           rtrim(repeat('{_GOOD}' || chr(10), m), chr(10)) ||
             CASE fam WHEN 0 THEN chr(10) || '{_LOREM}'
                      WHEN 1 THEN chr(10) || '{_BRACE}'
                      ELSE '' END AS clean_text,
           fam >= 3 AS c4_keep
    FROM p
    """,
)
def q_c4_filters(spark, sf_dir):
    """C4 cleaning (operators/docfilters.py:c4_clean — Raffel et al.
    2020 §2.2): per doc, m good lines (m = doc_id%3+3, or 2 for the
    too-few-sentences family), one sub-5-word line and one
    unterminated line that the line rule must drop, plus per-family a
    'lorem ipsum' line (doc dropped), a '{'-bearing line (doc
    dropped), or nothing. keep ⇔ family ∈ {3,4}."""
    d = T(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    fam = did % 5
    m = F.when(fam == 2, F.lit(2)).otherwise((did % 3) + 3)
    good_block = F.array_join(
        F.array_repeat(F.lit(_GOOD), m.cast("int")), "\n"
    )
    fam_line = (
        F.when(fam == 0, F.lit("\n" + _LOREM))
        .when(fam == 1, F.lit("\n" + _BRACE))
        .otherwise(F.lit(""))
    )
    text = F.concat(
        good_block,
        F.lit("\ntiny line.\nthis line has no terminal punctuation at all"),
        fam_line,
    )
    docs = d.select("doc_id", text.alias("text"))
    return c4_clean(docs).select(
        "doc_id", "n_lines_kept", "n_lines_dropped", "clean_text", "c4_keep"
    )


@q(
    "gopher_filters",
    f"""
    WITH p AS (
      SELECT doc_id,
             (doc_id % 3) + 5 AS k,
             doc_id % 4 AS fam
      FROM documents
    ), s AS (
      SELECT doc_id, k, fam,
             11 * k + CASE fam WHEN 0 THEN 6 WHEN 1 THEN 3
                               WHEN 2 THEN 7 ELSE 0 END AS n_words,
             41 * k + CASE fam WHEN 0 THEN 26 WHEN 1 THEN 24
                               WHEN 2 THEN 14 ELSE 0 END AS n_chars,
             CASE fam WHEN 1 THEN 1 WHEN 2 THEN 7 ELSE 0 END AS n_sym,
             CASE fam WHEN 0 THEN 1 ELSE 0 END AS n_noalpha,
             CASE fam WHEN 3 THEN k ELSE k + 1 END AS n_lines
      FROM p
    ), r AS (
      SELECT doc_id,
             n_words::BIGINT AS n_words,
             round(n_chars::DOUBLE / n_words, 9) AS mean_word_len,
             round(n_sym::DOUBLE / n_words, 9) AS symbol_ratio,
             round((n_words - n_noalpha)::DOUBLE / n_words, 9)
               AS alpha_word_frac,
             round(CASE WHEN fam = 0 THEN 1.0 / n_lines ELSE 0.0 END, 9)
               AS bullet_line_frac,
             round(CASE WHEN fam = 1 THEN 1.0 / n_lines ELSE 0.0 END, 9)
               AS ellipsis_line_frac,
             5::BIGINT AS stopword_hits
      FROM s
    )
    SELECT *,
           n_words BETWEEN 50 AND 100000
           AND mean_word_len BETWEEN 3.0 AND 10.0
           AND symbol_ratio <= 0.1
           AND alpha_word_frac >= 0.8
           AND bullet_line_frac <= 0.9
           AND ellipsis_line_frac <= 0.3
           AND stopword_hits >= 2 AS gopher_keep
    FROM r
    """,
)
def q_gopher_filters(spark, sf_dir):
    """Gopher A1.1 quality stats (operators/docfilters.py:
    gopher_stats — Rae et al. 2021): k = doc_id%3+5 base lines (11
    words / 41 chars each, 5 distinct stop-set words), plus per-family
    a bullet line with a no-alpha token, an ellipsis-terminated line,
    a '#'-heavy line whose symbol ratio crosses the 0.1 threshold at
    k=5 (verdict flips within the family), or nothing."""
    d = T(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    fam = did % 4
    k = (did % 3) + 5
    base_block = F.array_join(
        F.array_repeat(F.lit(_BASE), k.cast("int")), "\n"
    )
    fam_line = (
        F.when(fam == 0, F.lit("\n" + _BULLET))
        .when(fam == 1, F.lit("\n" + _ELLIP))
        .when(fam == 2, F.lit("\n" + _HASH))
        .otherwise(F.lit(""))
    )
    docs = d.select(
        "doc_id", F.concat(base_block, fam_line).alias("text")
    )
    return gopher_stats(docs).select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "alpha_word_frac",
        "bullet_line_frac",
        "ellipsis_line_frac",
        "stopword_hits",
        "gopher_keep",
    )
