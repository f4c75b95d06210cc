"""Character n-gram language-model scoring — the perplexity-proxy
quality filter (CCNet, Wenzek et al.: rank web text by LM perplexity
and keep the head; RefinedWeb and friends keep the same shape with
bigger models). A full KenLM is external tooling; the in-engine
equivalent is an add-k-smoothed character trigram model, which already
separates natural prose from boilerplate/gibberish and — unlike a
binary classifier — gives a continuous rankable score.

Two halves, both pure DataFrame ops:

- :func:`train_char_lm` — count trigrams over a (sampled) reference
  corpus: one explode + hash aggregate. The model is alphabet-bounded
  (|charset|³ rows worst case, ~10⁴-10⁵ real rows) — broadcast-sized
  regardless of corpus scale, which is the point: train on a sample,
  score everything.
- :func:`lm_score` — per-doc mean log-probability
  ``ln((c3+k)/(c2+k·V))`` under the broadcast model. The corpus side
  explodes to gram grain and re-aggregates by doc — ONE shuffle keyed
  by doc id; both model joins are broadcast. At 100 TB the explode is
  len× rows but narrow (doc_id + 3 chars), and partial aggregation
  combines map-side.

Smoothing/vocab contract (mirrored exactly by the DuckDB oracle):
``V`` = distinct final characters among training trigrams; unseen
gram with seen context → ``k/(c2+kV)``; unseen context → ``1/V``.
Docs shorter than ``n`` chars score NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["train_char_lm", "lm_score", "CharLM"]


def _grams(text_col: str, n: int):
    t = F.col(text_col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(0))),
        lambda i: F.substring(t, i, n),
    )


class CharLM:
    """Broadcast-sized trained model: trigram counts, context counts,
    vocab size."""

    def __init__(self, gram_counts: DataFrame, ctx_counts: DataFrame, vocab_size: int):
        self.gram_counts = gram_counts  # (gram, c3)
        self.ctx_counts = ctx_counts  # (ctx, c2)
        self.vocab_size = vocab_size


def train_char_lm(
    docs: DataFrame, n: int = 3, text_col: str = "text"
) -> CharLM:
    """Count n-grams over the reference corpus. One explode + two hash
    aggregates (gram and context grain); the single ``vocab_size``
    scalar is the only driver-side value (metadata-sized, like the
    PageRank node count)."""
    grams = docs.select(
        F.explode(_grams(text_col, n)).alias("gram")
    ).filter(F.length("gram") == n)
    gram_counts = grams.groupBy("gram").agg(
        F.count("*").cast("long").alias("c3")
    )
    ctx_counts = gram_counts.groupBy(
        F.substring("gram", 1, n - 1).alias("ctx")
    ).agg(F.sum("c3").alias("c2"))
    vocab_size = (
        gram_counts.select(
            F.substring("gram", n, 1).alias("ch")
        )
        .distinct()
        .count()
    )
    return CharLM(gram_counts, ctx_counts, vocab_size)


def lm_score(
    docs: DataFrame,
    lm: CharLM,
    n: int = 3,
    k: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """(id, lm_logp_avg): mean add-k-smoothed log-probability per
    character transition. Higher = more reference-like; filter or rank
    on it (CCNet keeps the best-perplexity head). NULL for docs
    shorter than ``n``."""
    grams = docs.select(
        F.col(id_col), F.explode(_grams(text_col, n)).alias("gram")
    ).filter(F.length("gram") == n)
    kv = float(k) * lm.vocab_size
    scored = (
        grams.withColumn("ctx", F.substring("gram", 1, n - 1))
        .join(F.broadcast(lm.gram_counts), "gram", "left")
        .join(F.broadcast(lm.ctx_counts), "ctx", "left")
        .select(
            id_col,
            F.log(
                (F.coalesce(F.col("c3"), F.lit(0)) + F.lit(float(k)))
                / (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(kv))
            ).alias("logp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.round(F.avg("logp"), round_to).alias("lm_logp_avg")
    )
    return docs.select(id_col).join(per_doc, id_col, "left")
