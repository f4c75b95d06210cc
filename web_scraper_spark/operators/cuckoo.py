"""Partitioned cuckoo URL-state filter (numpy, Arrow-batched) — the
deletable sibling of ``operators/bloom.py``.

The seen-set is append-only, so the crawl engine uses Bloom
(bloom.py's design note; SURVEY.md §7.2). But two frontier states DO
delete: retired URLs (revisit scheduling takes a page out of rotation)
and per-round in-flight reservations (released on fetch failure). A
Bloom filter cannot unset a bit; a cuckoo filter (Fan et al., CoNEXT
2014 — "Cuckoo Filter: Practically Better Than Bloom") stores 16-bit
fingerprints in 4-slot buckets with two candidate buckets per key
(partial-key cuckoo hashing: ``b2 = b1 XOR hash(fp)``), so membership,
insertion, AND deletion are all supported with ~2-4x better space than
Bloom at equal FPR.

Sharding mirrors bloom.py exactly: one filter per ``shard_id =
pmod(key, n_shards)`` stored as a binary row; probes co-group
candidates with their shard (``cogroup().applyInPandas``), so no
driver-resident state at the 10^10-URL design point and no shuffle of
anything but narrow key rows.

Determinism: fingerprints and bucket choices derive from the already-
computed xxhash64 key via the same splitmix64 finalizer bloom.py uses —
pure uint64 numpy, identical across processes. No false negatives for
present keys, ever; deleting a key removes one matching fingerprint
copy (delete of a non-member is a no-op, returned in the stats).
"""

from __future__ import annotations

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
    "CUCKOO_SCHEMA",
    "cuckoo_params",
    "build_cuckoo_table",
    "cuckoo_delete",
    "cuckoo_might_contain",
]

CUCKOO_SCHEMA = StructType(
    [
        StructField("shard_id", IntegerType(), False),
        StructField("n_shards", IntegerType(), False),
        StructField("n_buckets", LongType(), False),  # power of two
        StructField("n_items", LongType(), False),
        StructField("n_overflow", LongType(), False),
        StructField("table", BinaryType(), False),  # uint16 fp, 4 slots/bucket
    ]
)

_SLOTS = 4
_MAX_KICKS = 500


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (same as bloom.py) over uint64."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def cuckoo_params(expected_items: int) -> int:
    """Number of 4-slot buckets (power of two) for ~95% max load."""
    need = max(1, int(expected_items / (_SLOTS * 0.95)) + 1)
    return 1 << max(1, (need - 1).bit_length())


def _fingerprints(keys: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprints from the key hash."""
    fp = (_mix64(keys) >> np.uint64(48)).astype(np.uint16)
    fp[fp == 0] = 1  # 0 marks an empty slot
    return fp


def _bucket1(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    return (_mix64(keys ^ np.uint64(0x9E3779B97F4A7C15)) & np.uint64(n_buckets - 1)).astype(
        np.int64
    )


def _alt_bucket(b: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    """Partial-key cuckoo: b2 = b1 XOR hash(fp) (mod n_buckets)."""
    h = _mix64(fp.astype(np.uint64)) & np.uint64(n_buckets - 1)
    return (b.astype(np.uint64) ^ h).astype(np.int64)


def _insert_one(table: np.ndarray, n_buckets: int, b1: int, fp: int, rng_state: int):
    """Insert one fingerprint with bounded kicking. -> (ok, rng_state)."""
    b2 = int(_alt_bucket(np.array([b1]), np.array([fp], np.uint16), n_buckets)[0])
    for b in (b1, b2):
        row = table[b]
        empties = np.nonzero(row == 0)[0]
        if empties.size:
            row[empties[0]] = fp
            return True, rng_state
    # kick loop: deterministic LCG so the filter is reproducible
    b = b1
    cur = fp
    trail = []  # (bucket, slot) of every swap, for rollback on overflow
    for _ in range(_MAX_KICKS):
        rng_state = (rng_state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        slot = (rng_state >> 33) % _SLOTS
        trail.append((b, slot))
        cur, table[b][slot] = int(table[b][slot]), cur
        b = int(_alt_bucket(np.array([b]), np.array([cur], np.uint16), n_buckets)[0])
        row = table[b]
        empties = np.nonzero(row == 0)[0]
        if empties.size:
            row[empties[0]] = cur
            return True, rng_state
    # overflow: unwind the swaps so the table returns to its pre-insert
    # state — the dropped key is then the NEW one (the one n_overflow
    # counts), never an arbitrary previously-inserted victim
    for tb, tslot in reversed(trail):
        cur, table[tb][tslot] = int(table[tb][tslot]), cur
    return False, rng_state  # caller counts the overflow (no silent loss)


def build_cuckoo_table(
    df: DataFrame,
    key_col: str = "url_hash",
    n_shards: int = 64,
    expected_per_shard: int = 1 << 16,
) -> DataFrame:
    """Keys -> one cuckoo-filter row per ``pmod(key, n_shards)`` shard."""
    n_buckets = cuckoo_params(expected_per_shard)

    def make(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard_id"].iloc[0])
        keys = pdf[key_col].to_numpy(np.int64).astype(np.uint64)
        table = np.zeros((n_buckets, _SLOTS), dtype=np.uint16)
        fps = _fingerprints(keys)
        b1s = _bucket1(keys, n_buckets)
        n = 0
        overflow = 0
        state = shard + 1
        for b1, fp in zip(b1s, fps):
            ok, state = _insert_one(table, n_buckets, int(b1), int(fp), state)
            if ok:
                n += 1
            else:
                overflow += 1
        return pd.DataFrame(
            {
                "shard_id": [shard],
                "n_shards": [n_shards],
                "n_buckets": [n_buckets],
                "n_items": [n],
                "n_overflow": [overflow],
                "table": [table.tobytes()],
            }
        )

    keyed = df.select(
        F.col(key_col),
        F.pmod(F.col(key_col), F.lit(n_shards)).cast("int").alias("shard_id"),
    )
    return keyed.groupBy("shard_id").applyInPandas(make, schema=CUCKOO_SCHEMA)


def cuckoo_delete(
    table_df: DataFrame, keys_df: DataFrame, key_col: str = "url_hash"
) -> DataFrame:
    """Remove one fingerprint copy per key (no-op for non-members).
    Co-grouped per shard; returns the updated filter table."""

    def apply(filt_pdf: pd.DataFrame, del_pdf: pd.DataFrame) -> pd.DataFrame:
        if filt_pdf.empty:
            return filt_pdf
        out = filt_pdf.iloc[[0]].copy()
        n_buckets = int(out["n_buckets"].iloc[0])
        table = (
            np.frombuffer(out["table"].iloc[0], dtype=np.uint16)
            .reshape(n_buckets, _SLOTS)
            .copy()
        )
        removed = 0
        if not del_pdf.empty:
            keys = del_pdf[key_col].to_numpy(np.int64).astype(np.uint64)
            fps = _fingerprints(keys)
            b1s = _bucket1(keys, n_buckets)
            b2s = _alt_bucket(b1s, fps, n_buckets)
            for b1, b2, fp in zip(b1s, b2s, fps):
                for b in (int(b1), int(b2)):
                    hits = np.nonzero(table[b] == fp)[0]
                    if hits.size:
                        table[b][hits[0]] = 0
                        removed += 1
                        break
        out["table"] = [table.tobytes()]
        out["n_items"] = out["n_items"] - removed
        return out

    # shard count travels in the filter rows: a shard that happened to
    # receive no keys at build time must not change probe routing
    shards = table_df.select(F.max("n_shards")).first()[0]
    keyed = keys_df.select(
        F.col(key_col),
        F.pmod(F.col(key_col), F.lit(shards)).cast("int").alias("shard_id"),
    )
    return (
        table_df.groupBy("shard_id")
        .cogroup(keyed.groupBy("shard_id"))
        .applyInPandas(lambda fp, kp: apply(fp, kp), schema=CUCKOO_SCHEMA)
    )


def cuckoo_might_contain(
    candidates: DataFrame, table_df: DataFrame, key_col: str = "url_hash"
) -> DataFrame:
    """Candidates + ``maybe_member`` flag (no false negatives for
    inserted-and-not-deleted keys). Co-grouped probe, vectorized."""
    out_schema = StructType(
        [
            StructField(key_col, LongType(), False),
            StructField("maybe_member", BooleanType(), False),
        ]
    )

    def probe(cand_pdf: pd.DataFrame, filt_pdf: pd.DataFrame) -> pd.DataFrame:
        if cand_pdf.empty:
            return pd.DataFrame({key_col: [], "maybe_member": []}).astype(
                {key_col: np.int64, "maybe_member": bool}
            )
        keys = cand_pdf[key_col].to_numpy(np.int64).astype(np.uint64)
        if filt_pdf.empty:
            return pd.DataFrame(
                {key_col: keys.astype(np.int64), "maybe_member": False}
            )
        n_buckets = int(filt_pdf["n_buckets"].iloc[0])
        table = np.frombuffer(filt_pdf["table"].iloc[0], dtype=np.uint16).reshape(
            n_buckets, _SLOTS
        )
        fps = _fingerprints(keys)
        b1s = _bucket1(keys, n_buckets)
        b2s = _alt_bucket(b1s, fps, n_buckets)
        hit = (table[b1s] == fps[:, None]).any(axis=1) | (
            table[b2s] == fps[:, None]
        ).any(axis=1)
        return pd.DataFrame({key_col: keys.astype(np.int64), "maybe_member": hit})

    shards = table_df.select(F.max("n_shards")).first()[0]
    keyed = candidates.select(
        F.col(key_col),
        F.pmod(F.col(key_col), F.lit(shards)).cast("int").alias("shard_id"),
    )
    return keyed.groupBy("shard_id").cogroup(table_df.groupBy("shard_id")).applyInPandas(
        lambda c, t: probe(c, t), schema=out_schema
    )
