"""Codec-free AV1 OBU index over the low-overhead bitstream format.

Completes the elementary-stream index family (H.264/HEVC Annex-B in
operators/h264.py; MP4/WebM sample tables in operators/video.py) for
the third modern web codec. Bare AV1 streams (``.obu`` dumps, WebM
block payloads, many WARC ``video/av1`` responses) carry no start
codes at all: framing is the OBU header of the public AOM *AV1
Bitstream & Decoding Process Specification* §5.3.2 plus a leb128
size field (§4.10.5) — the low-overhead bitstream format of §5.2.

What this gives a 100 TB video pipeline, with zero codec work:

- **exact per-OBU byte extents** — the ranged-read fan-out unit, no
  second scan;
- **OBU type routing** — sequence headers to a parameter store,
  temporal delimiters / padding dropped, frames kept;
- **temporal_id / spatial_id** from the extension header — scalable-
  stream laddering (drop tid>k) as a pure Column filter;
- **frame_type / show_frame / keyframe flags** from the first
  uncompressed-header bits (§5.9.2: show_existing_frame, frame_type,
  show_frame), honouring the sequence header's
  ``reduced_still_picture_header`` shortcut.

Contract (shared with every media walker in this package): malformed
payloads yield nothing — never a stage failure, never an unbounded
allocation. Nothing here allocates from an untrusted length: the
leb128 size only bounds index arithmetic, and a size pointing past
the payload ends the walk with the complete OBUs seen so far.

Reference behavior: public spec only (AV1 spec §5.2/§5.3/§5.9). The
scraper reference has no media tier; this extends SURVEY.md §2.10's
multimodal family (VERDICT r4 "Next round" #4 family).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

__all__ = [
    "leb128_encode",
    "parse_obus",
    "synth_av1",
    "synth_av1_filler_len",
    "av1_obu_index",
    "with_synth_av1",
]

# obu_type values (spec §6.2.2)
OBU_SEQUENCE_HEADER = 1
OBU_TEMPORAL_DELIMITER = 2
OBU_FRAME_HEADER = 3
OBU_TILE_GROUP = 4
OBU_METADATA = 5
OBU_FRAME = 6
OBU_REDUNDANT_FRAME_HEADER = 7
OBU_PADDING = 15

_FRAME_HEADER_TYPES = frozenset(
    (OBU_FRAME_HEADER, OBU_FRAME, OBU_REDUNDANT_FRAME_HEADER)
)

FRAME_KEY = 0  # frame_type values (§6.8.2)
FRAME_INTER = 1


def leb128_encode(value: int) -> bytes:
    """leb128() of §4.10.5 — 7 bits per byte, LSB group first."""
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _leb128_read(data: bytes, pos: int):
    """-> (value, n_bytes) or None on truncation / >8-byte field."""
    value = 0
    for i in range(8):  # spec: leb128 fields are at most 8 bytes
        if pos + i >= len(data):
            return None
        b = data[pos + i]
        value |= (b & 0x7F) << (7 * i)
        if not (b & 0x80):
            return value, i + 1
    return None


def parse_obus(data: bytes):
    """-> list of OBU dicts, or None when the stream has no valid
    leading OBU header.

    Dict keys: ``offset`` (where the OBU header byte begins),
    ``obu_len`` (header + extension + size field + payload — exactly
    the bytes a ranged read fans out), ``header_len`` (everything
    before the payload), ``obu_type``, ``has_extension``,
    ``temporal_id`` / ``spatial_id`` (0 without an extension header),
    ``obu_size`` (payload bytes), and for frame-header-bearing OBUs
    ``show_existing`` / ``frame_type`` / ``show_frame`` /
    ``is_keyframe`` (None/0 elsewhere; when show_existing_frame is
    set the header carries no frame_type, so those stay None).

    Walk rules (all from §5.2/§5.3): forbidden bit or reserved bit
    set, or obu_type 0, ends the walk (returns None if nothing was
    parsed yet); a missing size field (obu_has_size_field == 0) is
    only legal for the final OBU, which then extends to end-of-data;
    a size pointing past the payload ends the walk without emitting
    the truncated OBU. The sequence header's
    reduced_still_picture_header bit (§5.5.1) switches later frame
    headers to the implicit KEY_FRAME/show_frame=1 form (§5.9.2).
    """
    n = len(data)
    out = []
    pos = 0
    reduced_still = False
    while pos < n:
        hdr = data[pos]
        if hdr & 0x80 or hdr & 0x01:  # forbidden bit / reserved bit
            break
        obu_type = (hdr >> 3) & 0x0F
        if obu_type == 0:  # reserved type
            break
        has_ext = (hdr >> 2) & 1
        has_size = (hdr >> 1) & 1
        tid = sid = 0
        hlen = 1
        if has_ext:
            if pos + 1 >= n:
                break
            ext = data[pos + 1]
            tid = (ext >> 5) & 0x07
            sid = (ext >> 3) & 0x03
            hlen = 2
        if has_size:
            got = _leb128_read(data, pos + hlen)
            if got is None:
                break
            size, sz_len = got
            hlen += sz_len
            if pos + hlen + size > n:
                break  # truncated payload: drop this OBU, keep prior
        else:
            size = n - pos - hlen  # legal only for the final OBU
        rec = {
            "offset": pos,
            "obu_len": hlen + size,
            "header_len": hlen,
            "obu_type": obu_type,
            "has_extension": has_ext,
            "temporal_id": tid,
            "spatial_id": sid,
            "obu_size": size,
            "show_existing": None,
            "frame_type": None,
            "show_frame": None,
            "is_keyframe": 0,
        }
        payload_at = pos + hlen
        if obu_type == OBU_SEQUENCE_HEADER and size >= 1:
            # seq_profile(3) still_picture(1) reduced_still_picture_header(1)
            reduced_still = bool((data[payload_at] >> 3) & 1)
        elif obu_type in _FRAME_HEADER_TYPES and size >= 1:
            if reduced_still:
                # §5.9.2: implicit KEY_FRAME, show_frame = 1
                rec["show_existing"] = 0
                rec["frame_type"] = FRAME_KEY
                rec["show_frame"] = 1
                rec["is_keyframe"] = 1
            else:
                b0 = data[payload_at]
                show_existing = (b0 >> 7) & 1
                rec["show_existing"] = show_existing
                if not show_existing:
                    frame_type = (b0 >> 5) & 0x03
                    rec["frame_type"] = frame_type
                    rec["show_frame"] = (b0 >> 4) & 1
                    rec["is_keyframe"] = 1 if frame_type == FRAME_KEY else 0
        out.append(rec)
        if not has_size:
            break
        pos += hlen + size
    return out or None


# ---------------------------------------------------------------------------
# Deterministic synth stream (every field a formula of doc_id, i)
# ---------------------------------------------------------------------------


def synth_av1_filler_len(doc_id: int, i: int) -> int:
    """Frame filler bytes; every i%4==2 frame jumps past 127 payload
    bytes so its leb128 size field takes 2 bytes on the wire — the
    multi-byte leb128 path is load-bearing for the offset math."""
    return 40 + (doc_id * 3 + i * 7) % 50 + (110 if i % 4 == 2 else 0)


def _obu(obu_type: int, payload: bytes, tid: int | None = None) -> bytes:
    ext = tid is not None
    hdr = bytes([(obu_type << 3) | (0x04 if ext else 0) | 0x02])
    if ext:
        hdr += bytes([(tid << 5)])
    return hdr + leb128_encode(len(payload)) + payload


def synth_av1(doc_id: int, n_frames: int) -> bytes:
    """Low-overhead AV1 stream: temporal delimiter (2 bytes) +
    sequence header (8 bytes: profile 0, not reduced) + metadata
    (6 bytes), then ``n_frames`` OBU_FRAMEs — KEY every 4th (no
    extension header), else INTER with an extension header carrying
    temporal_id i%3; every i%4==2 frame's payload exceeds 127 bytes
    (2-byte leb128 size). All filler content is a formula of
    (doc_id, i) so the index is a closed form for the oracle."""
    out = bytearray()
    out += _obu(OBU_TEMPORAL_DELIMITER, b"")
    seq = bytes([0x00]) + bytes(0x40 + (doc_id + j) % 0xBF for j in range(5))
    out += _obu(OBU_SEQUENCE_HEADER, seq)
    out += _obu(
        OBU_METADATA, bytes(0x40 + (doc_id * 2 + j) % 0xBF for j in range(4))
    )
    for i in range(n_frames):
        key = i % 4 == 0
        # show_existing=0, frame_type, show_frame=1, then filler bits
        first = 0x1C if key else 0x34
        payload = bytes([first]) + bytes(
            0x40 + (doc_id * 5 + i * 3 + j) % 0xBF
            for j in range(synth_av1_filler_len(doc_id, i))
        )
        out += _obu(OBU_FRAME, payload, tid=None if key else i % 3)
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark stages
# ---------------------------------------------------------------------------

_OBU_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("obu_idx", IntegerType(), False),
        StructField("offset", LongType(), False),
        StructField("obu_len", IntegerType(), False),
        StructField("header_len", IntegerType(), False),
        StructField("obu_type", IntegerType(), False),
        StructField("has_extension", IntegerType(), False),
        StructField("temporal_id", IntegerType(), False),
        StructField("spatial_id", IntegerType(), False),
        StructField("obu_size", IntegerType(), False),
        StructField("show_existing", IntegerType(), True),
        StructField("frame_type", IntegerType(), True),
        StructField("show_frame", IntegerType(), True),
        StructField("is_keyframe", IntegerType(), False),
    ]
)


def av1_obu_index(
    df: DataFrame, data_col: str = "data", id_col: str = "doc_id"
) -> DataFrame:
    """One row per OBU with its exact byte extent + routing fields.
    Arrow-batched mapInPandas, one Python stage, bytes never shuffle;
    undecodable payloads emit nothing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for d, v in zip(b[id_col], b[data_col]):
                obus = parse_obus(bytes(v)) if v is not None else None
                for k, obu in enumerate(obus or ()):
                    rows.append(
                        {
                            "doc_id": int(d),
                            "obu_idx": k,
                            "offset": obu["offset"],
                            "obu_len": obu["obu_len"],
                            "header_len": obu["header_len"],
                            "obu_type": obu["obu_type"],
                            "has_extension": obu["has_extension"],
                            "temporal_id": obu["temporal_id"],
                            "spatial_id": obu["spatial_id"],
                            "obu_size": obu["obu_size"],
                            "show_existing": obu["show_existing"],
                            "frame_type": obu["frame_type"],
                            "show_frame": obu["show_frame"],
                            "is_keyframe": obu["is_keyframe"],
                        }
                    )
            yield pd.DataFrame.from_records(
                rows, columns=[f.name for f in _OBU_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=_OBU_SCHEMA)


def with_synth_av1(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture stage: AV1 low-overhead stream with ``n = 4 + id%8``."""

    @pandas_udf(BinaryType())
    def _synth(ids: pd.Series) -> pd.Series:
        return pd.Series([synth_av1(int(i), 4 + int(i) % 8) for i in ids])

    return df.withColumn("data", _synth(F.col(id_col)))
