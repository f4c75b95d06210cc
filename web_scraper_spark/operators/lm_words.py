"""Word-level bigram language model: corpus training + document scoring.

The word-bigram complement to the character LM in ``lmscore.py``
(CCNet scores documents with a word-level KenLM; the char model covers
the alphabet-bounded case). Both stages are pure DataFrame ops:

- **training** — tokenize (ASCII-fold + lowercase + split), explode
  positional bigrams, two hash aggregates (bigram counts, history
  counts). Both aggs are map-side combinable, so the shuffle carries
  distinct n-grams, not token instances: at 100 TB of text the
  exchange is vocabulary-proportional (~10^9 bigram types), not
  corpus-proportional (~10^13 tokens).
- **scoring** — ONE equi-join of the document bigram stream against
  the pre-joined model table ``(w1, w2, logp)``. The model table is
  the join's build side; at small vocabularies Spark broadcasts it
  (AQE), at web vocabularies it hash-partitions on ``(w1, w2)`` — the
  same key the training agg already produced, so with the model
  persisted bucketed-by-key the scoring join is shuffle-free on the
  model side. Head-token skew ("the", "of") lives in the HISTORY join
  key only; scoring joins on the (w1, w2) pair, whose distribution is
  much flatter, and AQE skew-split covers the residue.

Probabilities use add-alpha smoothing over the history count:
``P(w2 | w1) = (c(w1,w2) + alpha) / (c(w1) + alpha * V)`` with ``V`` =
distinct token count (a 1-row scalar, broadcast). Tokenization strips
non-ASCII-alphanumerics BEFORE lowercasing so the fold is engine
portable (Unicode casemaps differ between engines; ASCII's does not).

Per-doc output is the mean log10 probability over the doc's bigrams —
higher = more fluent under the corpus model, the CCNet-style quality
signal used to bucket training data (head/middle/tail).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_tokens(text: Column) -> Column:
    """ASCII word tokens: non-alphanumerics folded to spaces, then
    lowercased and split. Engine-portable by construction."""
    folded = F.lower(F.regexp_replace(text, "[^A-Za-z0-9]+", " "))
    return F.filter(F.split(folded, " "), lambda t: t != "")


def doc_bigrams(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, w1, w2) — one row per positional bigram. The zip of the
    token array with its own tail is in-row (no shuffle); only the
    explode widens."""
    toks = docs.select(id_col, word_tokens(F.col(text_col)).alias("tk")).filter(
        F.size("tk") >= 2
    )
    pairs = F.arrays_zip(
        F.slice(F.col("tk"), 1, F.size("tk") - 1).alias("w1"),
        F.slice(F.col("tk"), 2, F.size("tk") - 1).alias("w2"),
    )
    return toks.select(id_col, F.explode(pairs).alias("p")).select(
        id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


def train_bigram_lm(
    docs: DataFrame,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Model table ``(w1, w2, logp)`` trained on the corpus.

    Two map-side-combinable hash aggs + one vocabulary scalar; the
    history join (bigram counts × history counts) shares the training
    agg's partitioning on ``w1``.
    """
    bg = doc_bigrams(docs, id_col=id_col, text_col=text_col)
    bigram_counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    history_counts = bg.groupBy("w1").agg(F.count("*").alias("ch"))
    vocab = (
        docs.select(F.explode(word_tokens(F.col(text_col))).alias("t"))
        .agg(F.countDistinct("t").cast("double").alias("vs"))
    )
    return (
        bigram_counts.join(history_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.log10(
                (F.col("cb") + F.lit(alpha))
                / (F.col("ch") + F.lit(alpha) * F.col("vs"))
            ).alias("logp"),
        )
    )


def score_bigram_lm(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean bigram log10-probability under ``model``.

    ONE equi-join on (w1, w2) + one hash agg on the doc id. Documents
    with < 2 tokens produce no row (no bigrams to score).
    """
    bg = doc_bigrams(docs, id_col=id_col, text_col=text_col)
    return (
        bg.join(model, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("logp"), 6).alias("lp_avg"),
        )
    )
