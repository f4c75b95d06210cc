"""Source-level corpus curation: domain quality gating and
temperature-based mixture resampling.

Two domain-granularity moves every CC-scale pretraining pipeline makes
between "cleaned docs" and "training mix":

- **Domain quality gate**: aggregate per-source quality signals and
  drop whole sources below threshold (the CCNet/RefinedWeb move —
  spam farms are domain-shaped, and per-doc filters leak their
  better-looking pages). Corpus-level ratios are computed as
  sum/sum, not mean-of-ratios, so a source can't hide junk behind a
  few long clean docs.
- **Temperature mixture** (:func:`mixture_rates` +
  :func:`mixture_sample`): per-source sampling rate
  ``(T_s / T_min) ** (tau - 1)``, so post-sample token mass is
  proportional to ``T_s ** tau`` — multilingual-T5-style temperature
  flattening with no upsampling (the smallest source keeps rate 1;
  bigger sources are down-sampled progressively harder). Acceptance is the deterministic md5 bucket of the doc id,
  so the sampled set is a pure function of (salt, id, rates):
  reproducible across re-runs, engines, and cluster widths.

Plan shape at 100 TB: one aggregate shuffled by source (domains are
millions, docs are billions — the stats table is tiny relative to the
corpus), rates broadcast back, and the accept test is a scan-local
projection + filter. No driver-side state beyond the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import tokens
from .sampling import _hash_bucket

__all__ = [
    "source_stats",
    "source_quality_gate",
    "mixture_rates",
    "mixture_sample",
]

_BUCKETS = 10_000


def source_stats(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source corpus stats: doc count, whitespace-token total, and
    corpus-level alpha ratio (sum of alpha chars / sum of chars,
    rounded 4dp)."""
    t = F.col(text_col)
    return (
        docs.select(
            F.col(source_col).alias("source"),
            F.size(tokens(t)).alias("_toks"),
            F.length(t).alias("_chars"),
            F.length(F.regexp_replace(t, r"[^A-Za-z]", "")).alias("_alpha"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_toks").alias("total_tokens"),
            F.round(
                F.sum("_alpha")
                / F.greatest(F.sum("_chars"), F.lit(1)).cast("double"),
                4,
            ).alias("alpha_ratio"),
        )
    )


def source_quality_gate(
    docs: DataFrame,
    min_alpha: float = 0.5,
    min_docs: int = 1,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Keep only docs whose SOURCE passes the corpus-level gate —
    including that source's individually clean-looking pages' junk
    siblings (domain-shaped spam dies whole). Broadcast semi-join of
    the (tiny) passing-source set back onto the corpus."""
    kept = source_stats(docs, source_col, text_col).filter(
        (F.col("alpha_ratio") >= min_alpha) & (F.col("n_docs") >= min_docs)
    )
    return docs.join(
        F.broadcast(kept.select(F.col("source").alias(source_col))),
        source_col,
        "left_semi",
    )


def mixture_rates(
    stats: DataFrame,
    temperature: float = 0.7,
    tokens_col: str = "total_tokens",
) -> DataFrame:
    """Per-source acceptance rate ``min(1, (T_s/T_min)^(tau-1))``,
    rounded 4dp: post-sample tokens ∝ ``T_s^tau`` (tau=1 keeps all,
    tau→0 equalizes token mass across sources); the smallest source is
    never up-sampled. ``T_min`` comes from an unpartitioned min window
    — the stats table is domain-sized, so the single-partition window
    is metadata-cheap."""
    from pyspark.sql import Window

    t_min = F.min(tokens_col).over(Window.partitionBy())
    return stats.withColumn(
        "rate",
        F.least(
            F.lit(1.0),
            F.round(
                F.pow(
                    F.col(tokens_col) / t_min.cast("double"),
                    F.lit(temperature - 1.0),
                ),
                4,
            ),
        ),
    )


def mixture_sample(
    docs: DataFrame,
    rates: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic per-source down-sample: a doc survives iff its md5
    bucket falls under its source's rate. ``rates`` needs (source,
    rate) and is broadcast; output keeps ``docs``'s schema."""
    thr = F.round(F.col("rate") * _BUCKETS).cast("long")
    r = F.broadcast(
        rates.select(F.col("source").alias(source_col), thr.alias("_thr"))
    )
    bucket = _hash_bucket(F.col(id_col), salt, _BUCKETS)
    return (
        docs.join(r, source_col)
        .filter(bucket < F.col("_thr"))
        .drop("_thr")
    )
