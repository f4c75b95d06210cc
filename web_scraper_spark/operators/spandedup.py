"""Cross-document duplicate-SPAN removal — the token-window variant of
exact-substring dedup (Lee et al., "Deduplicating Training Data Makes
Language Models Better": repeated ≥W-token substrings are memorization
fuel even when whole docs are unique).

Granularity ladder in this package: whole-doc (``dedup.py``), line
(``linededup.py``), and this module — verbatim token windows shared
ACROSS documents. The classic implementation is a corpus-wide suffix
array, which is sequential and RAM-bound; the Spark-shaped equivalent
used here is rolling window hashing:

1. tokenize once; every position ``p`` with ``p+W ≤ n`` hashes its
   ``W``-token window (md5 of the space-joined window — computed
   in-row over the token array, no explode for hashing),
2. one shuffle groups window hashes; the minimum ``doc_id`` per hash
   is the canonical owner — every other document's instances are
   removable (first-writer-wins, deterministic),
3. removable instances expand to their covered positions (explode is
   W× but only over DUP instances, a tiny fraction of the corpus),
4. reassembly drops covered positions and rejoins tokens — a
   left-anti join + one per-doc aggregate.

Plan shape at 100 TB: two data-proportional shuffles (hash group,
reassembly) + one anti-join; nothing is all-pairs and no driver state.
Within the canonical (minimum-id) document, repeats are kept — the
within-doc signal is ``ngram_dup_fraction``'s job.

Semantics note: output text is token-normalized (single spaces) —
the same contract as the tokenizer feeding training, where this op
runs. Byte-preserving removal lives in ``linededup.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import tokens

__all__ = ["duplicate_span_marks", "strip_duplicate_spans"]


def _window_hashes(t: F.Column, window: int) -> F.Column:
    """md5 hash per window start position (0-based); empty array when
    the doc is shorter than ``window``. ``sequence`` is guarded —
    Spark's sequence(0, negative) counts DOWN instead of returning
    empty."""
    starts = F.when(
        F.size(t) >= window, F.sequence(F.lit(0), F.size(t) - window)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        starts,
        lambda p: F.md5(F.concat_ws(" ", F.slice(t, p + 1, F.lit(window)))),
    )


def duplicate_span_marks(
    docs: DataFrame,
    window: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos) token positions covered by a window that appears
    verbatim in a lower-id document (the removable set)."""
    t = tokens(F.col(text_col))
    wins = docs.select(
        F.col(id_col), F.posexplode(_window_hashes(t, window)).alias("p", "whash")
    )
    first = wins.groupBy("whash").agg(F.min(id_col).alias("_first_doc"))
    removable = (
        wins.join(first, "whash")
        .filter(F.col(id_col) > F.col("_first_doc"))
        .select(id_col, "p")
    )
    return removable.select(
        id_col,
        F.explode(F.sequence(F.col("p"), F.col("p") + (window - 1))).alias("pos"),
    ).distinct()


def strip_duplicate_spans(
    docs: DataFrame,
    window: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, clean_text, n_removed): every cross-doc duplicate
    ≥``window``-token span removed except from its minimum-id owner.
    A fully-duplicated document survives as an empty string (so the
    row set is stable for downstream joins)."""
    marks = duplicate_span_marks(docs, window, id_col, text_col)
    toked = docs.select(
        id_col, tokens(F.col(text_col)).alias("_t")
    )
    positions = toked.select(
        id_col, F.posexplode("_t").alias("pos", "tok")
    )
    kept = (
        positions.join(marks, [id_col, "pos"], "left_anti")
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
            ).alias("_clean"),
            F.count("*").alias("_n_kept"),
        )
    )
    return (
        toked.join(kept, id_col, "left")
        .select(
            id_col,
            F.coalesce("_clean", F.lit("")).alias("clean_text"),
            (F.size("_t") - F.coalesce("_n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )
