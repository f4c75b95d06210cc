"""Token-window document chunking for training-data preparation.

Long documents must be split into model-context-sized pieces before
sequence packing (operators/sampling.py:pack_sequences). This operator
explodes each document into fixed-size token windows with a configurable
overlap (stride = chunk - overlap), the standard recipe for LM
pretraining shards (GPT-2/3 style sliding windows) and for retrieval
corpora (overlapping passages).

Scale shape: everything is in-row — ``split`` -> ``sequence`` of window
starts -> one ``posexplode``. Zero shuffles, zero Python; the fan-out
factor is bounded by ceil(n_tokens / stride) per document, so a 100 TB
corpus chunks in a single embarrassingly parallel map stage and the
output is already co-partitioned with its input for any downstream
per-document work.

Contract notes:
- tokenization is whitespace (``\\s+`` on trimmed text) — the same
  tokenizer used by token_count in functions/textstats.py, so chunk
  token counts reconcile with corpus-level token accounting;
- every window start produced by ``sequence(0, n_tokens-1, stride)`` is
  emitted, including a trailing window shorter than ``chunk_tokens``
  (it is clamped, never padded) — deterministic and twin-checkable;
- empty/whitespace-only documents produce zero chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap_tokens: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into token windows of ``chunk_tokens`` with
    ``overlap_tokens`` of overlap between consecutive windows.

    Returns (id_col, chunk_id, chunk_start, chunk_len, chunk_text):
    ``chunk_id`` numbers windows 0..k per document in token order,
    ``chunk_start`` is the 0-based token offset, ``chunk_len`` the
    actual (clamped) token count of the window.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("overlap_tokens must satisfy 0 <= overlap < chunk")
    stride = chunk_tokens - overlap_tokens

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # trim("") splits to [""] — treat as zero tokens
    n_tokens = F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(
        F.size(toks)
    )

    exploded = (
        docs.select(
            F.col(id_col),
            toks.alias("__toks"),
            n_tokens.alias("__n"),
        )
        .where(F.col("__n") > 0)
        .select(
            id_col,
            "__toks",
            F.posexplode(
                F.sequence(F.lit(0), F.col("__n") - 1, F.lit(stride))
            ).alias("chunk_id", "chunk_start"),
            F.col("__n"),
        )
    )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("chunk_start").cast("int").alias("chunk_start"),
        F.least(F.lit(chunk_tokens), F.col("__n") - F.col("chunk_start"))
        .cast("int")
        .alias("chunk_len"),
        F.array_join(
            F.slice(F.col("__toks"), F.col("chunk_start") + 1, chunk_tokens),
            " ",
        ).alias("chunk_text"),
    )
