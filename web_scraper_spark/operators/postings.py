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

__all__ = ["term_postings", "bm25_topk"]


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


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 20,
    min_token_len: int = 2,
    round_to: int = 4,
) -> DataFrame:
    """Okapi BM25 retrieval over the corpus: top-k docs for a bag of
    query terms (Robertson et al., TREC-3) — the standard relevance
    scorer a crawl corpus feeds (quality-weighted sampling, search
    eval, retrieval-augmented training data).

    score(d) = sum over query terms t of
        ln(1 + (N - df_t + 0.5)/(df_t + 0.5))           [Lucene idf]
        * tf_td * (k1 + 1) / (tf_td + k1*(1 - b + b*dl_d/avgdl))

    Shape at 100 TB: the tokenizer is the same in-row native split as
    :func:`term_postings`; doc length is ONE map-side-combinable
    aggregate; query-term tf touches only rows whose term is in the
    (tiny, broadcast-literal) query set; N/avgdl/df are scalar or
    query-sized. The final top-k is a row_number over a deterministic
    total order (rounded score desc, doc asc) so results are stable
    across engines and runs.

    Returns ``(doc, score, n_terms_hit)`` with exactly ``top_k`` rows
    (fewer if fewer docs match any term).
    """
    from pyspark.sql import Window

    tokens = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(F.split(F.col(text_col), "[^A-Za-z]+")).alias("raw"),
        )
        .filter(F.length("raw") >= min_token_len)
        .select("doc", F.lower(F.col("raw")).alias("term"))
    )
    tokens = tokens.persist()
    dl = tokens.groupBy("doc").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    # scalar corpus stats (metadata-sized driver reads)
    n_docs = docs.select(id_col).distinct().count()
    avgdl = dl.agg(
        F.sum("dl").cast("double") / F.lit(float(n_docs))
    ).first()[0]
    qt = [t.lower() for t in query_terms]
    tf = (
        tokens.filter(F.col("term").isin(qt))
        .groupBy("term", "doc")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, "doc")
        .select(
            "doc",
            (
                idf
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.lit(float(avgdl))
                    )
                )
            ).alias("term_score"),
        )
        .groupBy("doc")
        .agg(
            F.round(F.sum("term_score"), round_to).alias("score"),
            F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
        )
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc").asc())
    out = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .drop("rn")
    )
    tokens.unpersist()
    return out
