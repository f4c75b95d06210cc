"""Cross-document line-level deduplication (boilerplate removal).

The CCNet/RefinedWeb-family cleanup a training-data pipeline runs after
extraction: lines that recur across many documents of a corpus (nav
menus, cookie banners, footers) are detected by a line-fingerprint
count and stripped from every document, preserving the original line
order of what remains.

All pure DataFrame plans; line identity is md5 over a case- and
whitespace-normalized line, so the operator has a byte-identical
ANSI-SQL oracle (same recipe as ``functions.textstats.fingerprint``).

Scale notes (100 TB):
- ``boilerplate_lines`` is one explode + one hash-aggregate shuffle on
  the line fingerprint with map-side partial aggregation; the output is
  the corpus's heavy-hitter line set — orders of magnitude smaller than
  the corpus (bounded by ``min_docs``).
- ``strip_boilerplate`` joins the exploded lines against that set on
  the fingerprint. The boilerplate side is small → AQE picks a
  broadcast hash join; the reassembly is one groupBy(doc_id) whose
  ``collect_list`` is bounded by a single document's line count.
- Nothing is ever all-pairs and no state grows with corpus history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["doc_lines", "boilerplate_lines", "strip_boilerplate"]


def _line_fp(line: F.Column) -> F.Column:
    """Line identity: md5 of the lower/trim/whitespace-collapsed line
    (portable: DuckDB ``md5(trim(regexp_replace(lower(l),'\\s+',' ','g')))``)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(line), r"\s+", " ")))


def doc_lines(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pos, line, line_fp) rows — one per physical line, with
    the 1-based position needed to reassemble the document byte-
    identically. Empty (whitespace-only) lines carry ``line_fp`` NULL:
    they are document structure, never boilerplate candidates."""
    lines = F.split(F.col(text_col), r"\n")
    exploded = docs.select(
        "doc_id", F.posexplode(lines).alias("pos0", "line")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        "line",
        F.when(F.trim("line") != "", _line_fp(F.col("line"))).alias("line_fp"),
    )
    return exploded


def boilerplate_lines(
    docs: DataFrame, min_docs: int = 3, text_col: str = "text"
) -> DataFrame:
    """The corpus's boilerplate line set: (line_fp, n_docs, sample_line)
    for every normalized line appearing in ≥ ``min_docs`` distinct
    documents. ``sample_line`` is the lexicographic min raw form — a
    deterministic representative for inspection."""
    return (
        doc_lines(docs, text_col)
        .filter(F.col("line_fp").isNotNull())
        .groupBy("line_fp")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("line").alias("sample_line"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate(
    docs: DataFrame, min_docs: int = 3, text_col: str = "text"
) -> DataFrame:
    """Remove every boilerplate line (per ``boilerplate_lines``) from
    every document, preserving the order and bytes of surviving lines.

    Returns (doc_id, text, n_lines, n_removed) where ``text`` is the
    surviving lines re-joined with ``\\n``. A document whose every line
    was boilerplate survives with empty text (n_lines counts the
    original physical lines) — corpus membership is a separate filter's
    decision, not this operator's.
    """
    lines = doc_lines(docs, text_col)
    bp = boilerplate_lines(docs, min_docs=min_docs, text_col=text_col).select(
        "line_fp"
    )
    # null-fp (blank) lines never match the inner side of a left join,
    # so structure lines always survive
    tagged = lines.join(
        bp.withColumn("is_bp", F.lit(True)), on="line_fp", how="left"
    )
    kept = F.when(
        F.col("is_bp").isNull(), F.struct(F.col("pos"), F.col("line"))
    )
    return (
        tagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(F.col("is_bp").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(kept)), lambda s: s["line"]
                ),
                "\n",
            ).alias("text"),
        )
        .select("doc_id", "text", "n_lines", "n_removed")
    )
