"""Multimodal (binary-payload) column plumbing.

Images/audio/video ride as opaque ``binary`` columns with typed
metadata (exactly how ``pages.html`` rides here). The Spark-side
contract — schema, Arrow batching, partitioning, UDF signatures — is
real and tested; the actual media decode is STUBBED because no
image/audio libraries exist in this container:

- ``binary_meta``: native-expression metadata (byte length, md5,
  magic-byte sniff) — no Python.
- ``decode_features``: ``mapInPandas`` stage with the batch shape a real
  decoder would use; produces deterministic fake features derived from
  the bytes, or raises ``NotImplementedError`` when
  ``strict=True`` (the clearly-marked stub).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["sniff_format", "binary_meta", "decode_features", "frame_sample"]

_MAGIC = [
    ("png", b"\x89PNG"),
    ("jpeg", b"\xff\xd8\xff"),
    ("gif", b"GIF8"),
    ("riff", b"RIFF"),  # wav/webp container
    ("pdf", b"%PDF"),
    ("html", b"<htm"),
]


def sniff_format(data: Column) -> Column:
    """Container sniff from magic bytes — pure Column expr."""
    expr = F.lit("unknown")
    for name, magic in reversed(_MAGIC):
        expr = F.when(
            F.substring(data, 1, len(magic)) == F.lit(magic), F.lit(name)
        ).otherwise(expr)
    return expr


def binary_meta(df: DataFrame, data_col: str = "data") -> DataFrame:
    """Adds (n_bytes, content_md5, format) typed metadata columns."""
    return (
        df.withColumn("n_bytes", F.octet_length(F.col(data_col)).cast("long"))
        .withColumn("content_md5", F.md5(F.col(data_col)))
        .withColumn("format", sniff_format(F.col(data_col)))
    )


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("format", StringType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
        StructField("n_frames", IntegerType(), True),
    ]
)


def decode_features(
    df: DataFrame,
    data_col: str = "data",
    id_col: str = "doc_id",
    feature_dim: int = 8,
    strict: bool = False,
) -> DataFrame:
    """Decode/feature-extract stage over binary payloads.

    Real pipelines put PIL/ffmpeg/torchaudio here; this container has
    none, so with ``strict=True`` the stage raises
    ``NotImplementedError`` (decode genuinely unavailable), and by
    default it emits a deterministic fake: ``feature[i]`` = mean of
    payload bytes at positions ≡ i (mod dim), scaled to [0,1];
    ``n_frames`` = n_bytes // 1024 + 1 (a frame-sampling stand-in).
    The Arrow batch shape, schema, and partitioning are the real
    contract a decoder drops into.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        if strict:
            raise NotImplementedError(
                "media decode libraries are not available in this environment; "
                "plug PIL/ffmpeg into this mapInPandas stage"
            )
        for pdf in batches:
            ids, sizes, fmts, feats, frames = [], [], [], [], []
            for i, raw in zip(pdf[id_col], pdf[data_col]):
                b = np.frombuffer(bytes(raw), dtype=np.uint8)
                ids.append(int(i))
                sizes.append(int(b.size))
                fmt = "unknown"
                for name, magic in _MAGIC:
                    if bytes(raw)[: len(magic)] == magic:
                        fmt = name
                        break
                fmts.append(fmt)
                if b.size == 0:
                    feats.append([0.0] * feature_dim)
                else:
                    feats.append(
                        [
                            round(float(b[k::feature_dim].mean()) / 255.0, 6)
                            if b[k::feature_dim].size
                            else 0.0
                            for k in range(feature_dim)
                        ]
                    )
                frames.append(int(b.size // 1024 + 1))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_bytes": sizes,
                    "format": fmts,
                    "feature": feats,
                    "n_frames": frames,
                }
            )

    src = df.select(F.col(id_col), F.col(data_col))
    return src.mapInPandas(run, schema=_FEATURE_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("offset", LongType(), False),
        StructField("frame_len", IntegerType(), False),
        StructField("byte_mean", DoubleType(), False),
    ]
)


def frame_sample(
    df: DataFrame,
    data_col: str = "data",
    id_col: str = "doc_id",
    frame_size: int = 1024,
    max_frames: int = 4,
    strict: bool = False,
) -> DataFrame:
    """Frame-sampling stage over binary payloads (video/audio stand-in).

    Real pipelines seek keyframes with ffmpeg here; the deterministic
    stand-in treats the payload as fixed-size byte windows ("frames")
    and samples ``min(max_frames, n_frames)`` of them evenly across the
    payload: sampled global frame index ``(i * n_frames) // n_sel``.
    One output row per sampled frame — the fan-out (explode) shape a
    real frame sampler produces, so downstream per-frame operators
    (dedup, feature-extract) are exercised against the true cardinality.
    Empty payloads produce no frames.

    With ``strict=True`` raises ``NotImplementedError`` (media decode
    genuinely unavailable in this container).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        if strict:
            raise NotImplementedError(
                "media decode libraries are not available in this environment; "
                "plug ffmpeg keyframe sampling into this mapInPandas stage"
            )
        for pdf in batches:
            ids, fidx, offs, lens, means = [], [], [], [], []
            for i, raw in zip(pdf[id_col], pdf[data_col]):
                b = np.frombuffer(bytes(raw), dtype=np.uint8)
                n = int(b.size)
                if n == 0:
                    continue
                n_frames = -(-n // frame_size)
                n_sel = min(max_frames, n_frames)
                for s in range(n_sel):
                    f = (s * n_frames) // n_sel
                    off = f * frame_size
                    chunk = b[off : off + frame_size]
                    ids.append(int(i))
                    fidx.append(f)
                    offs.append(off)
                    lens.append(int(chunk.size))
                    means.append(round(float(chunk.mean()) / 255.0, 6))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": fidx,
                    "offset": offs,
                    "frame_len": lens,
                    "byte_mean": means,
                }
            )

    src = df.select(F.col(id_col), F.col(data_col))
    return src.mapInPandas(run, schema=_FRAME_SCHEMA)
