"""Corpus deduplication operators for web-scale training-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup over a
``documents``-shaped table (doc_id, text). All are pure DataFrame
plans; hashing is built on ``md5`` so every operator has a
byte-identical ANSI-SQL oracle (md5 hex strings compare the same in
Spark and DuckDB — no engine-specific hash needed).

Scale notes:
- exact dedup: one hash-aggregate shuffle on the content hash.
- MinHash/LSH: explode(shingles) → per-doc min-hash per seed (partial
  aggregation map-side) → band join; candidate pairs ~ O(near-dups),
  never O(n²).
- SimHash: same explode/agg shape; 16-bit signature keeps the SQL
  oracle tractable while preserving the algorithm.
- n-gram Jaccard: pairwise only *within* LSH/band buckets (here gated
  by a candidate join), never a full cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import fingerprint, tokens

__all__ = [
    "exact_duplicates",
    "shingles",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "simhash",
    "jaccard_pairs",
    "decontaminate",
]


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup via content fingerprint: one row per duplicate
    group (>1 member) with the canonical (min) doc_id."""
    return (
        docs.select("doc_id", fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def shingles(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingle) rows: word n-gram shingles over normalized
    tokens, distinct per doc.

    The token array is materialized as a column BEFORE the shingle
    lambda: Catalyst does no common-subexpression elimination across
    lambda boundaries, so referencing the tokenizer expression inside
    ``transform`` re-runs the regex split per shingle (measured 30x
    slower). With a column reference the split runs once per row."""
    with_toks = docs.select(
        "doc_id", tokens(F.lower(F.col(text_col))).alias("toks")
    )
    toks = F.col("toks")
    grams = F.transform(
        # sequence(0, size-n) inclusive → size-n+1 shingles
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
    )
    grams = F.when(F.size(toks) >= n, grams).otherwise(F.array())
    return with_toks.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("shingle")
    )


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 8
) -> DataFrame:
    """Per-doc MinHash signature: for seed k, min(md5(k || '|' || shingle))
    over the doc's shingles. md5-as-string min is portable and
    order-stable; the aggregation is a map-side-combinable min."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{k}|"), F.col("shingle")))).alias(f"mh{k}")
        for k in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, num_hashes: int = 8, band_size: int = 4
) -> DataFrame:
    """LSH banding: docs sharing any band (md5 of band_size concatenated
    min-hashes) become candidate pairs (a < b). The self-join is on the
    band key — co-partitioned, output ~ near-duplicates only."""
    n_bands = num_hashes // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col(f"mh{b * band_size + j}") for j in range(band_size)]
                    )
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    banded = signatures.select("doc_id", F.explode(bands).alias("band")).select(
        "doc_id", F.col("band.band_id").alias("band_id"), F.col("band.band_hash").alias("band_hash")
    )
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def simhash(docs: DataFrame, text_col: str = "text", bits: int = 16) -> DataFrame:
    """16-bit SimHash: per token, bit j = high bit of the j-th hex digit
    of md5(token); signature bit = sign of the per-doc vote sum.
    Returns (doc_id, simhash string of '0'/'1')."""
    tok = (
        docs.select("doc_id", F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))
        .withColumn("h", F.md5("tok"))
    )
    votes = [
        F.sum(
            F.when(
                F.substring("h", j + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"),
                1,
            ).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    sig = F.concat(
        *[F.when(F.col(f"v{j}") > 0, F.lit("1")).otherwise(F.lit("0")) for j in range(bits)]
    )
    return agg.select("doc_id", sig.alias("simhash"))


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_overlap: int = 2,
) -> DataFrame:
    """Benchmark decontamination: per training doc, the number of word
    ``n``-gram shingles it shares with ANY eval-set document, keeping
    docs whose overlap stays below ``min_overlap`` (the Brown/GPT-3-
    style n-gram overlap filter).

    Returns (doc_id, n_overlap, contaminated). Plan shape at 100 TB:
    the eval side is a benchmark suite — thousands of docs, not
    billions — so its distinct shingle set broadcasts and the training
    corpus is ONE explode + broadcast semi-join + hash-aggregate; the
    corpus never shuffles on anything but doc_id partial counts.
    """
    eval_sh = shingles(eval_docs, text_col=text_col, n=n).select(
        "shingle"
    ).distinct()
    doc_sh = shingles(docs, text_col=text_col, n=n)
    overlap = (
        doc_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_overlap"))
    )
    return (
        docs.select("doc_id")
        .join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_overlap).alias(
                "contaminated"
            ),
        )
    )


def jaccard_pairs(
    docs: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact token-set Jaccard for candidate pairs (doc_a, doc_b):
    |A∩B| / |A∪B| over distinct lowered tokens, keep ≥ threshold.
    Intended to verify LSH candidates — the joins are per-candidate,
    not all-pairs."""
    toksets = docs.select(
        "doc_id", F.array_distinct(tokens(F.lower(F.col(text_col)))).alias("toks")
    )
    a = toksets.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"))
    b = toksets.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size(F.array_union("toks_a", "toks_b"))
    return (
        candidates.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(inter / F.greatest(union, F.lit(1)).cast("double"), 4).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
