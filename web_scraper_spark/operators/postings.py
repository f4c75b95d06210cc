"""Inverted-index posting statistics over the document corpus.

A crawl corpus feeding search or retrieval-augmented training needs
term-level statistics: document frequency (how many docs contain a
term), collection frequency (total occurrences), and the posting list
itself. The reference has no notion of a corpus (one Mongo document
per page); this is the standard web-scale reduction.

Shape at 100 TB: tokenize in-row (native ``split`` — no Python), then
ONE hash aggregation on (term, doc) for per-doc tf, then ONE on term.
Both are map-side combinable, so the shuffle carries the vocabulary
(millions of rows), not the token stream (trillions). No window, no
join. ``min_df`` prunes hapax noise before the rows leave the executor
that aggregated them.

Tokenization is deliberately lowercase-ASCII-alpha (``[^a-z]+`` split):
byte-identical semantics are expressible in any engine, which keeps
the oracle twin exact; language-aware tokenization belongs to the
token-count / quality operators (functions/textstats.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["term_postings"]


def term_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    min_token_len: int = 2,
) -> DataFrame:
    """Per-term corpus statistics: ``(term, doc_freq, coll_freq, max_tf)``.

    ``doc_freq`` = distinct docs containing the term, ``coll_freq`` =
    total occurrences, ``max_tf`` = the largest single-document term
    frequency (the posting-list head weight). Terms shorter than
    ``min_token_len`` or appearing in fewer than ``min_df`` docs are
    dropped.
    """
    # split on non-ASCII-letters FIRST, lowercase the pure-[A-Za-z]
    # tokens after: ASCII-only lowercasing is engine-invariant, whereas
    # lowercasing full Unicode text first can synthesize ASCII letters
    # (e.g. U+0130 -> 'i' + combining dot) and shift token boundaries.
    tokens = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(F.split(F.col(text_col), "[^A-Za-z]+")).alias("raw"),
        )
        .filter(F.length("raw") >= min_token_len)
        .select("doc", F.lower(F.col("raw")).alias("term"))
    )
    per_doc = tokens.groupBy("term", "doc").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    return (
        per_doc.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("doc_freq"),
            F.sum("tf").cast("long").alias("coll_freq"),
            F.max("tf").cast("long").alias("max_tf"),
        )
        .filter(F.col("doc_freq") >= min_df)
    )
