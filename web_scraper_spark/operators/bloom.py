"""Partitioned Bloom URL-seen filter (numpy, Arrow-batched).

Why not a single driver-side filter: at the 10^10-URL design point a
0.1%-FPP filter is ~17 GiB — never driver-resident. The seen-set is
therefore sharded by ``bucket_id = pmod(url_hash, n_buckets)`` into one
Bloom filter per bucket, stored as binary rows in a table; membership
checks co-group candidates with their bucket's filter
(``cogroup().applyInPandas``), so each executor holds only the buckets it
probes. This is the "per-bucket filters stored as binary rows" design
from SURVEY.md §7.3(4).

Hashing is double-hashing over the already-computed ``xxhash64`` URL
identity: h_i = h1 + i*h2 (mod m), with h1/h2 derived from the 64-bit
key by a splitmix64 finalizer — pure uint64 numpy, deterministic across
processes, no Python-level per-row work.

Properties (tested in tests/test_bloom.py): zero false negatives by
construction; FPR ≤ ~2x the configured target at the sized load.

Spark's own ``bloom_filter_agg``/``might_contain`` expressions are not
SQL-registered in this build, and ``DataFrame.stat.bloomFilter`` is gone
in PySpark 4 — hence numpy. The reference has no dedup filter at all
beyond a per-day Mongo ``find_one`` (nausys_tracker.py:375-387); Bloom
(not cuckoo) is chosen because the seen-set is append-only — no
deletions needed (SURVEY.md §7.2). States that DO evict (retired
URLs, in-flight reservations) get the deletable sibling:
``operators/cuckoo.py``.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

__all__ = [
    "bloom_params",
    "bloom_capacity",
    "build_bloom_table",
    "merge_bloom_tables",
    "bloom_might_contain",
    "BLOOM_SCHEMA",
]

BLOOM_SCHEMA = StructType(
    [
        StructField("bucket_id", IntegerType(), False),
        StructField("m_bits", LongType(), False),
        StructField("k_hashes", IntegerType(), False),
        StructField("n_items", LongType(), False),
        StructField("bits", BinaryType(), False),
    ]
)


def bloom_params(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) for the target false-positive probability."""
    n = max(1, expected_items)
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    m = (m + 63) // 64 * 64  # whole uint64 words
    k = max(1, int(round(m / n * math.log(2))))
    return m, min(k, 16)


def bloom_capacity(m_bits: int, fpp: float = 0.01) -> int:
    """Items an ``m_bits`` filter holds at the target FPP — the inverse
    of ``bloom_params``. Incremental maintenance checks the persisted
    filter's remaining headroom against this before reusing it."""
    return max(1, int(m_bits * (math.log(2) ** 2) / math.log(1.0 / fpp)))


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over uint64 (vectorized)."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


def _positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(len(hashes), k) bit positions via double hashing."""
    h = hashes.astype(np.int64).view(np.uint64)
    h1 = _mix64(h)
    h2 = _mix64(h ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)  # odd
    i = np.arange(k, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        pos = h1[:, None] + i * h2[:, None]
    return (pos % np.uint64(m_bits)).astype(np.int64)


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    flat = pos.reshape(-1)
    np.bitwise_or.at(bits, flat >> 3, (1 << (flat & 7)).astype(np.uint8))


def _test_bits(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """row-wise AND over the k probes."""
    probe = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return probe.all(axis=1)


def build_bloom_table(
    seen: DataFrame,
    n_buckets: int,
    expected_items_per_bucket: int,
    fpp: float = 0.01,
    hash_col: str = "url_hash",
    params: tuple[int, int] | None = None,
) -> DataFrame:
    """One Bloom filter row per bucket over ``seen[hash_col]``.

    Distributed build: shuffle by bucket (the seen table is already
    bucket-partitioned in the catalog, so this co-partitions), each task
    materializes only its bucket's bitset.

    ``params`` pins (m_bits, k) explicitly — a delta filter that will be
    OR-merged into an existing table MUST share its exact geometry.
    """
    m_bits, k = params if params else bloom_params(expected_items_per_bucket, fpp)

    def make_filter(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        hashes = pdf[hash_col].to_numpy()
        if len(hashes):
            _set_bits(bits, _positions(hashes, m_bits, k))
        return pd.DataFrame(
            {
                "bucket_id": [int(pdf["bucket_id"].iloc[0])],
                "m_bits": [m_bits],
                "k_hashes": [k],
                "n_items": [len(hashes)],
                "bits": [bits.tobytes()],
            }
        )

    bucketed = seen.withColumn(
        "bucket_id", F.pmod(F.col(hash_col), F.lit(n_buckets)).cast("int")
    )
    return bucketed.groupBy("bucket_id").applyInPandas(make_filter, BLOOM_SCHEMA)


def merge_bloom_tables(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bitwise-OR union of two bloom tables with identical geometry.

    The incremental-maintenance primitive: ``seen_bloom(v) =
    merge(seen_bloom(v-1), bloom(new urls of round v))``. OR-merging
    same-(m, k) filters is exact — membership of every item inserted
    into either side is preserved (zero false negatives), so a crawl
    never rescans the full seen set to refresh the filter; the caller
    verifies geometry (and remaining capacity) BEFORE merging and falls
    back to a full rebuild otherwise. Shuffles only n_buckets bitset
    rows, co-partitioned on bucket_id.
    """

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        m_bits = int(pdf["m_bits"].iloc[0])
        k = int(pdf["k_hashes"].iloc[0])
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        for raw in pdf["bits"]:
            bits |= np.frombuffer(raw, dtype=np.uint8)
        return pd.DataFrame(
            {
                "bucket_id": [int(pdf["bucket_id"].iloc[0])],
                "m_bits": [m_bits],
                "k_hashes": [k],
                "n_items": [int(pdf["n_items"].sum())],
                "bits": [bits.tobytes()],
            }
        )

    return (
        a.unionByName(b).groupBy("bucket_id").applyInPandas(merge, BLOOM_SCHEMA)
    )


def bloom_might_contain(
    candidates: DataFrame,
    bloom_table: DataFrame,
    n_buckets: int,
    hash_col: str = "url_hash",
    flag_col: str = "might_be_seen",
) -> DataFrame:
    """Adds ``flag_col`` (bool): False ⇒ definitely unseen.

    Co-grouped per bucket so a bucket's bitset crosses the wire once per
    task, not once per row.
    """
    out_schema = StructType(
        candidates.schema.fields + [StructField(flag_col, BooleanType(), False)]
    )

    cand_cols = [f.name for f in candidates.schema.fields]

    def probe(cand_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
        out = cand_pdf[cand_cols].copy()
        if bloom_pdf.empty or cand_pdf.empty:
            out[flag_col] = False
            return out
        row = bloom_pdf.iloc[0]
        bits = np.frombuffer(row["bits"], dtype=np.uint8)
        pos = _positions(
            cand_pdf[hash_col].to_numpy(), int(row["m_bits"]), int(row["k_hashes"])
        )
        out[flag_col] = _test_bits(bits, pos)
        return out

    cand_b = candidates.withColumn(
        "__bucket_id", F.pmod(F.col(hash_col), F.lit(n_buckets)).cast("int")
    )
    bloom_b = bloom_table.withColumnRenamed("bucket_id", "__bucket_id")
    result = (
        cand_b.groupBy("__bucket_id")
        .cogroup(bloom_b.groupBy("__bucket_id"))
        .applyInPandas(probe, out_schema)
    )
    return result
