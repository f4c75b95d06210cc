"""Deterministic corpus sampling and sequence packing for training-data
pipelines.

Two operations every pretraining pipeline runs between "cleaned
corpus" and "training batches":

- **Stratified down-sampling** (:func:`hash_sample`): keep each
  stratum (language, quality bucket, source) at its own rate — the
  CC-pipeline move that stops English/boilerplate from drowning the
  mix. Sampling is by *hash*, not ``rand()``: membership is a pure
  function of (salt, id), so re-runs, resumed jobs, and the DuckDB
  oracle all select the identical set — and at 100 TB the sample is
  reproducible without persisting a selection table.
- **Sequence packing** (:func:`pack_sequences`): GPT-style pretraining
  concatenates documents (with a separator token) into fixed-length
  context windows; a document may straddle window boundaries. Packing
  is a per-shard running sum + integer division — one window pass,
  no Python, no driver state. Shards are independent, so the layout
  parallelizes to any cluster width while staying byte-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hash_sample", "pack_sequences", "split_assign"]


def _hash_bucket(id_col: F.Column, salt: str, buckets: int) -> F.Column:
    # first 8 md5 hex chars -> uniform 32-bit int; md5 is the one hash
    # both Spark and DuckDB expose byte-identically
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % buckets
    )


def hash_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "wss",
    default_fraction: float = 0.0,
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic stratified sample: a row survives iff its hash
    bucket falls under its stratum's rate. Strata absent from
    ``fractions`` get ``default_fraction``. Pure projection + filter —
    zero shuffle, and the filter pushes down past column pruning."""
    bucket = _hash_bucket(F.col(id_col), salt, buckets)
    thresh = F.lit(int(default_fraction * buckets))
    for k, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == k, F.lit(int(frac * buckets))
        ).otherwise(thresh)
    return docs.filter(bucket < thresh)


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 2048,
    n_shards: int = 64,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    sep_tokens: int = 1,
) -> DataFrame:
    """Concatenative packing layout: per shard, documents are laid out
    in ``id`` order, each followed by ``sep_tokens`` separator tokens,
    and the stream is cut into windows of ``max_tokens``. Returns one
    row per document::

        (shard, <id>, <tokens>, start_offset, window_first, window_last)

    ``window_first``/``window_last`` are the first/last context-window
    indices the document occupies within its shard (straddling is the
    GPT packing semantic — no padding waste, exact token accounting).
    Shard assignment is the deterministic md5 bucket of the id, so the
    layout is stable under re-runs and cluster-width changes."""
    shard = _hash_bucket(F.col(id_col), "shard", n_shards)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = docs.select(
        shard.alias("shard"),
        F.col(id_col),
        F.col(tokens_col),
        (F.col(tokens_col) + F.lit(sep_tokens)).alias("_sized"),
    )
    cum = sized.withColumn("_cum", F.sum("_sized").over(w))
    return cum.select(
        "shard",
        id_col,
        tokens_col,
        (F.col("_cum") - F.col("_sized")).alias("start_offset"),
        F.floor((F.col("_cum") - F.col("_sized")) / max_tokens).alias(
            "window_first"
        ),
        # last token of the doc itself (separator excluded) — empty
        # docs (0 tokens) sit entirely at their start offset
        F.floor(
            F.greatest(
                F.col("_cum") - F.lit(sep_tokens) - 1,
                F.col("_cum") - F.col("_sized"),
            )
            / max_tokens
        ).alias("window_last"),
    )


def split_assign(
    docs: DataFrame,
    by_col: str = "domain",
    splits: list[tuple[str, float]] | None = None,
    salt: str = "split",
    buckets: int = 10_000,
) -> DataFrame:
    """Leakage-safe train/valid/test assignment: the split is a pure
    hash function of a *content-owner* key (registrable domain), not of
    the document id — so mirrors, templated pages, and near-duplicates
    within a site can never straddle the train/eval boundary (the
    standard complement to n-gram decontamination; splitting web text
    i.i.d. by document leaks aggressively because intra-site near-dups
    are the norm). Deterministic across re-runs, engines, and cluster
    widths — no selection table to persist at 100 TB; zero shuffle
    (pure projection, pushes past column pruning).

    ``splits`` is an ordered list of (name, fraction); fractions are
    quantized to ``buckets`` and the LAST split absorbs rounding slack
    so every row gets exactly one split. Appends a ``split`` column.
    """
    if splits is None:
        splits = [("train", 0.98), ("valid", 0.01), ("test", 0.01)]
    if abs(sum(f for _, f in splits) - 1.0) > 1e-9:
        raise ValueError("split fractions must sum to 1")
    bucket = _hash_bucket(F.col(by_col), salt, buckets)
    expr = None
    cum = 0.0
    for name, frac in splits[:-1]:
        cum += frac
        cond = bucket < int(cum * buckets)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(splits[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return docs.withColumn("split", expr)
