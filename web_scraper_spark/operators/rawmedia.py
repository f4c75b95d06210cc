"""REAL pixel + frame-structure decode for codec-free image formats.

Companion to ``operators/audio.py`` (real WAV/PCM decode): two more
modalities where the published container layout alone is a complete
decoder, shrinking the honest stub surface of
``operators/multimodal.py`` to formats that genuinely need a codec
(JPEG/PNG pixel data, video):

- **BMP (Windows DIB, BI_RGB)** — uncompressed 24/32-bit pixels are raw
  bytes behind a fixed header: ``parse_bmp`` + ``decode_bmp_pixels``
  recover the full pixel array (bottom-up row order, 4-byte row
  padding), and ``decode_bmp_features`` emits dimensions + integer-
  exact per-channel means. This is real PIXEL decode, no stand-in.
- **GIF (87a/89a) frame structure** — pixel data is LZW (needs a
  codec) but the FRAME STRUCTURE is length-prefixed and walkable
  without decoding: ``gif_frames`` enumerates every image descriptor
  (position, size) with its Graphic Control Extension delay/disposal —
  the real frame-sampling index a video-adjacent pipeline needs
  (which frames exist, where, how long) — and ``gif_frame_index``
  exposes it as a Spark stage.

Both stages are single Arrow ``mapInPandas`` passes on the scan layout:
payload bytes never shuffle, outputs are narrow typed rows. Malformed
payloads yield null/empty, never a stage failure. Deterministic synths
(``synth_bmp`` / ``synth_gif``) are the byte-level inverses used by the
DuckDB oracles, which replay the same integer formulas without ever
seeing a container.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

__all__ = [
    "synth_bmp",
    "parse_bmp",
    "decode_bmp_pixels",
    "decode_bmp_features",
    "synth_gif",
    "gif_frames",
    "gif_frame_index",
]

# shared with operators/audio.py and the battery oracles
_MULT = 2654435761
_STRIDE = 40503


# ---------------------------------------------------------------------------
# BMP — real pixel decode (BI_RGB 24/32-bit)
# ---------------------------------------------------------------------------


def _bmp_stride(width: int, bpp: int) -> int:
    return ((width * (bpp // 8)) + 3) // 4 * 4


def synth_bmp(doc_id: int, width: int, height: int, bpp: int = 24) -> bytes:
    """A valid bottom-up BI_RGB BMP whose ENTIRE pixel array (padding
    included) is ``byte[j] = (doc_id*2654435761 + j*40503) % 256`` over
    the linear array offset j — replayable in pure integer SQL."""
    stride = _bmp_stride(width, bpp)
    n = stride * height
    j = np.arange(n, dtype=np.int64)
    pixels = ((doc_id * _MULT + j * _STRIDE) % 256).astype(np.uint8).tobytes()
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bpp, 0, n, 2835, 2835, 0, 0
    )
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + n, 0, 0, off)
    return header + info + pixels


def parse_bmp(data: bytes):
    """-> (width, height, bpp, top_down, pixel_offset, stride) or None.

    BITMAPFILEHEADER ('BM', pixel offset at byte 10) +
    BITMAPINFOHEADER (size>=40; negative height = top-down rows).
    Only uncompressed BI_RGB 24/32-bit — the layouts that ARE raw
    pixels. Everything else is honestly not decodable here.
    """
    if len(data) < 54 or data[:2] != b"BM":
        return None
    pixel_off = int.from_bytes(data[10:14], "little")
    hdr_size = int.from_bytes(data[14:18], "little")
    if hdr_size < 40:
        return None
    width = int.from_bytes(data[18:22], "little", signed=True)
    height = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if compression != 0 or bpp not in (24, 32) or width <= 0 or height == 0:
        return None
    top_down = height < 0
    height = abs(height)
    stride = _bmp_stride(width, bpp)
    if pixel_off + stride * height > len(data):
        return None
    return width, height, bpp, top_down, pixel_off, stride


def decode_bmp_pixels(data: bytes):
    """-> uint8 array of shape (height, width, channels) in BGR(A)
    order with rows in TOP-DOWN display order, or None."""
    hdr = parse_bmp(data)
    if hdr is None:
        return None
    width, height, bpp, top_down, off, stride = hdr
    ch = bpp // 8
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * height, offset=off)
    rows = raw.reshape(height, stride)[:, : width * ch].reshape(height, width, ch)
    return rows if top_down else rows[::-1]


_BMP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("bpp", IntegerType(), True),
        StructField("mean_b", DoubleType(), True),
        StructField("mean_g", DoubleType(), True),
        StructField("mean_r", DoubleType(), True),
        StructField("mean_a", DoubleType(), True),
    ]
)


def decode_bmp_features(
    df: DataFrame, data_col: str = "data", id_col: str = "doc_id"
) -> DataFrame:
    """Real pixel statistics: dimensions + per-channel means with
    integer-exact sums (bit-identical to the SQL oracle's replay)."""

    def row(doc_id: int, v) -> dict:
        null = dict.fromkeys(
            ("width", "height", "bpp", "mean_b", "mean_g", "mean_r", "mean_a")
        )
        null["doc_id"] = doc_id
        if v is None:
            return null
        px = decode_bmp_pixels(bytes(v))
        if px is None:
            return null
        h, w, ch = px.shape
        n = h * w
        sums = px.reshape(n, ch).astype(np.int64).sum(axis=0)
        out = {
            "doc_id": doc_id,
            "width": w,
            "height": h,
            "bpp": ch * 8,
            "mean_b": int(sums[0]) / n,
            "mean_g": int(sums[1]) / n,
            "mean_r": int(sums[2]) / n,
            "mean_a": int(sums[3]) / n if ch == 4 else None,
        }
        return out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame.from_records(
                [row(int(d), v) for d, v in zip(b[id_col], b[data_col])],
                columns=[f.name for f in _BMP_SCHEMA.fields],
            )

    return df.mapInPandas(run, schema=_BMP_SCHEMA)


# ---------------------------------------------------------------------------
# GIF — real frame-structure walk (no LZW decode needed or claimed)
# ---------------------------------------------------------------------------


def synth_gif(doc_id: int, n_frames: int) -> bytes:
    """A structurally valid GIF89a with ``n_frames`` image descriptors.

    Geometry/delays are pure functions of ``(doc_id, frame)`` — the
    oracle formulas:
        w = 4 + (doc_id + f) % 9,  h = 3 + (doc_id * 3 + f) % 7,
        x = f % 5,                 y = (f * 2) % 5,
        delay_cs = 3 + (doc_id * 7 + f) % 12
    Pixel sub-blocks carry deterministic filler bytes (the walker skips
    them by their length prefixes exactly as it would real LZW data).
    """
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", 20, 20) + bytes([0x00, 0, 0])  # LSD, no GCT
    for f in range(n_frames):
        w = 4 + (doc_id + f) % 9
        h = 3 + (doc_id * 3 + f) % 7
        x, y = f % 5, (f * 2) % 5
        delay = 3 + (doc_id * 7 + f) % 12
        # Graphic Control Extension
        out += bytes([0x21, 0xF9, 4, 0x04]) + struct.pack("<H", delay) + b"\x00\x00"
        # image descriptor, no local color table
        out += b"\x2c" + struct.pack("<HHHH", x, y, w, h) + b"\x00"
        # LZW min code size + one filler sub-block + terminator
        filler = bytes(((doc_id + f + k) % 256 for k in range(5)))
        out += bytes([2, len(filler)]) + filler + b"\x00"
    out += b"\x3b"
    return bytes(out)


def gif_frames(data: bytes):
    """Walk the GIF block structure -> [(frame_idx, x, y, w, h,
    delay_cs)] without decoding pixel data, or None when the payload is
    not a GIF. Tolerates missing trailers (truncated files stop at the
    last complete block) — comment/application/plain-text extensions
    are skipped by their sub-block length prefixes.
    """
    n = len(data)
    if n < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    pos = 10
    packed = data[pos]
    pos += 3  # packed, bg color, aspect
    if packed & 0x80:  # global color table
        pos += 3 * (2 << (packed & 0x7))
    frames = []
    delay = 0
    while pos < n:
        b0 = data[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            if pos + 2 > n:
                break
            label = data[pos + 1]
            pos += 2
            if label == 0xF9 and pos + 6 <= n and data[pos] == 4:
                delay = int.from_bytes(data[pos + 2 : pos + 4], "little")
            while pos < n and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            if pos + 10 > n:
                break
            x, y, w, h = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
            packed_i = data[pos + 9]
            pos += 10
            if packed_i & 0x80:  # local color table
                pos += 3 * (2 << (packed_i & 0x7))
            pos += 1  # LZW min code size
            while pos < n and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            frames.append((len(frames), x, y, w, h, delay))
            delay = 0
        else:
            return frames or None  # lost block sync
    return frames


_GIF_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("x", IntegerType(), False),
        StructField("y", IntegerType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("delay_cs", IntegerType(), False),
    ]
)


def gif_frame_index(
    df: DataFrame, data_col: str = "data", id_col: str = "doc_id"
) -> DataFrame:
    """Frame-sampling index over GIF payloads: one row per frame with
    position, size, and display delay. Undecodable payloads emit
    nothing (pair with ``binary_meta`` to account for them)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for d, v in zip(b[id_col], b[data_col]):
                fr = gif_frames(bytes(v)) if v is not None else None
                for idx, x, y, w, h, delay in fr or ():
                    rows.append(
                        {
                            "doc_id": int(d),
                            "frame_idx": idx,
                            "x": x,
                            "y": y,
                            "w": w,
                            "h": h,
                            "delay_cs": delay,
                        }
                    )
            yield pd.DataFrame.from_records(
                rows, columns=[f.name for f in _GIF_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=_GIF_SCHEMA)


def with_synth_bmp(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture stage: BMP payload with geometry
    ``w = 16 + id%17, h = 8 + id%13, bpp = 24 + 8*(id%2)``."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def _synth(ids: pd.Series) -> pd.Series:
        return pd.Series(
            [
                synth_bmp(
                    int(i), 16 + int(i) % 17, 8 + int(i) % 13, 24 + 8 * (int(i) % 2)
                )
                for i in ids
            ]
        )

    return df.withColumn("data", _synth(F.col(id_col)))


def with_synth_gif(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture stage: GIF payload with ``n_frames = 1 + id%5``."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def _synth(ids: pd.Series) -> pd.Series:
        return pd.Series(
            [synth_gif(int(i), 1 + int(i) % 5) for i in ids]
        )

    return df.withColumn("data", _synth(F.col(id_col)))
