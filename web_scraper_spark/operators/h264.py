"""Codec-free H.264/AVC Annex-B elementary-stream NAL index.

The MP4/WebM walkers (operators/video.py) index frames via container
sample tables, but bare H.264 byte streams (broadcast TS payloads,
Annex-B dumps, many WARC ``video/h264`` responses) carry no container:
the only structure is the Annex-B start-code framing of ISO/IEC
14496-10 §B.1 plus the NAL unit header of §7.3.1 — both published
spec, same class as the RFC 3533 Ogg page walk (operators/audio.py).

What this gives a 100 TB video pipeline, with zero codec work:

- **exact per-NAL byte extents** — the fan-out unit a downstream
  decoder reads, byte-ranged, without scanning the stream again;
- **NAL type / ref_idc** — route SPS/PPS to a parameter-set store,
  drop SEI/filler, keep slices;
- **IDR + slice_type** (first two exp-Golomb fields of the slice
  header, §7.3.3) — keyframe sampling and I/P/B mix statistics
  without touching macroblock data.

The parse is real: start-code scan (3- and 4-byte prefixes plus
``leading_zero_8bits``), forbidden-bit check, and exp-Golomb decoding
of ``first_mb_in_slice``/``slice_type`` from the RBSP after removing
``emulation_prevention_three_byte`` escapes (§7.4.1.1) — the escape
insertion is what GUARANTEES the start-code scan can never split a
NAL, and the tests pin that property with crafted payloads.

Contract (shared with every media walker in this package): malformed
payloads yield nothing — never a stage failure, never an unbounded
allocation (every structure here is bounded by the payload length by
construction, since NAL extents partition the input bytes).

Reference behavior: public spec only (ISO/IEC 14496-10). The scraper
reference has no media tier; this extends SURVEY.md §2.10's
multimodal family (VERDICT r4 "Next round" #4).
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
    "escape_rbsp",
    "unescape_ebsp",
    "parse_annexb",
    "synth_h264",
    "h264_nal_index",
    "with_synth_h264",
    "parse_annexb_hevc",
    "synth_hevc",
    "hevc_nal_index",
    "with_synth_hevc",
]

# nal_unit_type values (§7.4.1, Table 7-1)
NAL_SLICE = 1
NAL_IDR = 5
NAL_SEI = 6
NAL_SPS = 7
NAL_PPS = 8
NAL_AUD = 9

_SLICE_TYPES = frozenset(range(1, 6))  # coded-slice NAL types 1..5

# how many EBSP bytes we unescape to read the two leading exp-Golomb
# slice-header fields; ue(v) for first_mb/slice_type needs <=15 bits
# each, so 32 bytes is generous
_SLICE_HDR_PROBE = 32


# ---------------------------------------------------------------------------
# RBSP <-> EBSP (emulation prevention, §7.4.1.1)
# ---------------------------------------------------------------------------


def escape_rbsp(rbsp: bytes) -> bytes:
    """Insert emulation_prevention_three_byte: any 0x0000 followed by
    a byte <= 0x03 gets 0x03 spliced in, so no NAL payload can contain
    a start-code prefix."""
    out = bytearray()
    zeros = 0
    for byte in rbsp:
        if zeros >= 2 and byte <= 0x03:
            out.append(0x03)
            zeros = 0
        out.append(byte)
        zeros = zeros + 1 if byte == 0 else 0
    return bytes(out)


def unescape_ebsp(ebsp: bytes) -> bytes:
    """Remove emulation_prevention_three_byte (0x000003 -> 0x0000)."""
    out = bytearray()
    zeros = 0
    i = 0
    n = len(ebsp)
    while i < n:
        byte = ebsp[i]
        if zeros >= 2 and byte == 0x03:
            zeros = 0
            i += 1
            continue
        out.append(byte)
        zeros = zeros + 1 if byte == 0 else 0
        i += 1
    return bytes(out)


class _Bits:
    """MSB-first bit reader for exp-Golomb fields."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def bit(self):
        byte_i, off = divmod(self.pos, 8)
        if byte_i >= len(self.data):
            return None
        self.pos += 1
        return (self.data[byte_i] >> (7 - off)) & 1

    def ue(self):
        """Unsigned exp-Golomb (§9.1): z leading zeros, then z+1 bits."""
        zeros = 0
        while True:
            b = self.bit()
            if b is None:
                return None
            if b:
                break
            zeros += 1
            if zeros > 31:  # malformed: no real header field is this wide
                return None
        v = 1
        for _ in range(zeros):
            b = self.bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v - 1


# ---------------------------------------------------------------------------
# Annex-B parse
# ---------------------------------------------------------------------------


def _annexb_extents(data: bytes):
    """Start-code scan shared by the H.264 and HEVC walks -> list of
    (extent_start, payload_start_code_end, extent_end), or None when
    no start code exists. Emulation prevention guarantees no 0x000001
    falls inside a NAL payload; leading zeros (4-byte prefixes,
    leading_zero_8bits) fold into each NAL's extent so consecutive
    extents tile the byte range."""
    n = len(data)
    marks = []
    pos = 0
    while True:
        hit = data.find(b"\x00\x00\x01", pos)
        if hit < 0:
            break
        marks.append(hit)
        pos = hit + 3
    if not marks:
        return None
    starts = []
    for hit in marks:
        first = hit
        while first > 0 and data[first - 1] == 0:
            first -= 1
        starts.append((first, hit))
    return [
        (first, hit + 3, starts[k + 1][0] if k + 1 < len(starts) else n)
        for k, (first, hit) in enumerate(starts)
    ]


def parse_annexb(data: bytes):
    """-> list of NAL dicts, or None when no start code exists.

    Dict keys: ``offset`` (where this NAL's start-code prefix begins —
    leading_zero_8bits attach here so extents partition the stream),
    ``start_code_len``, ``nal_len`` (prefix + header + EBSP payload,
    i.e. exactly the bytes a ranged read fans out), ``nal_type``,
    ``ref_idc``, ``is_idr``, and for coded slices ``slice_type`` /
    ``first_mb`` (None when the header is truncated).

    NALs with the forbidden_zero_bit set or an empty header are
    skipped (their bytes still belong to the preceding extent walk);
    a stream with no start code at all returns None.
    """
    extents = _annexb_extents(data)
    if extents is None:
        return None
    out = []
    for first, hdr_at, end in extents:
        if hdr_at >= end:
            continue  # start code at EOF / back-to-back prefixes
        hdr = data[hdr_at]
        if hdr & 0x80:
            continue  # forbidden_zero_bit set: malformed NAL
        nal_type = hdr & 0x1F
        ref_idc = (hdr >> 5) & 0x3
        rec = {
            "offset": first,
            "start_code_len": hdr_at - first,
            "nal_len": end - first,
            "nal_type": nal_type,
            "ref_idc": ref_idc,
            "is_idr": 1 if nal_type == NAL_IDR else 0,
            "slice_type": None,
            "first_mb": None,
        }
        if nal_type in _SLICE_TYPES:
            probe = unescape_ebsp(data[hdr_at + 1 : min(end, hdr_at + 1 + _SLICE_HDR_PROBE)])
            bits = _Bits(probe)
            first_mb = bits.ue()
            slice_type = bits.ue()
            if first_mb is not None and slice_type is not None:
                rec["first_mb"] = first_mb
                rec["slice_type"] = slice_type
        out.append(rec)
    return out


# ---------------------------------------------------------------------------
# Deterministic synth stream (every field a formula of doc_id, i)
# ---------------------------------------------------------------------------


def _ue_bits(v: int) -> str:
    b = bin(v + 1)[2:]
    return "0" * (len(b) - 1) + b


def _bits_to_bytes(bits: str) -> bytes:
    bits = bits + "1" * (-len(bits) % 8)  # pad to byte with 1s
    return bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))


def synth_filler_len(doc_id: int, i: int) -> int:
    return 20 + (doc_id * 7 + i * 13) % 30


def synth_h264(doc_id: int, n_slices: int) -> bytes:
    """Annex-B stream: SPS (4-byte prefix, 8-byte payload) + PPS
    (3-byte prefix, 4-byte payload), then ``n_slices`` coded slices —
    IDR every 4th (slice_type 7, ref_idc 3, 4-byte prefix), else
    P/B alternating (slice_type i%2, ref_idc 2, 3-byte prefix).
    Filler is ``synth_filler_len`` bytes of nonzero content; every ODD
    slice additionally carries a raw 0x000001 in its RBSP that the
    escape layer must expand to 0x00000301 (+1 byte on the wire), so
    emulation prevention is load-bearing for the offset arithmetic."""
    out = bytearray()
    out += b"\x00\x00\x00\x01\x67"
    out += bytes([0x42, 0xC0, 0x1E]) + bytes(
        0x40 + (doc_id + j) % 0xBF for j in range(5)
    )
    out += b"\x00\x00\x01\x68"
    out += bytes(0x40 + (doc_id * 2 + j) % 0xBF for j in range(4))
    for i in range(n_slices):
        idr = i % 4 == 0
        out += b"\x00\x00\x00\x01\x65" if idr else b"\x00\x00\x01\x41"
        st = 7 if idr else i % 2
        rbsp = bytearray(_bits_to_bytes(_ue_bits(0) + _ue_bits(st)))
        rbsp += bytes(
            0x40 + (doc_id * 3 + i * 5 + j) % 0xBF
            for j in range(synth_filler_len(doc_id, i))
        )
        if i % 2:
            rbsp += b"\x00\x00\x01\x80"  # would-be start code: must escape
        out += escape_rbsp(bytes(rbsp))
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark stages
# ---------------------------------------------------------------------------

_NAL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("nal_idx", IntegerType(), False),
        StructField("offset", LongType(), False),
        StructField("start_code_len", IntegerType(), False),
        StructField("nal_len", IntegerType(), False),
        StructField("nal_type", IntegerType(), False),
        StructField("ref_idc", IntegerType(), False),
        StructField("is_idr", IntegerType(), False),
        StructField("slice_type", IntegerType(), True),
        StructField("first_mb", IntegerType(), True),
    ]
)


def h264_nal_index(
    df: DataFrame, data_col: str = "data", id_col: str = "doc_id"
) -> DataFrame:
    """One row per NAL unit with its exact byte extent + slice fields.
    Arrow-batched mapInPandas, one Python stage, bytes never shuffle;
    undecodable payloads emit nothing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for d, v in zip(b[id_col], b[data_col]):
                nals = parse_annexb(bytes(v)) if v is not None else None
                for k, nal in enumerate(nals or ()):
                    rows.append(
                        {
                            "doc_id": int(d),
                            "nal_idx": k,
                            "offset": nal["offset"],
                            "start_code_len": nal["start_code_len"],
                            "nal_len": nal["nal_len"],
                            "nal_type": nal["nal_type"],
                            "ref_idc": nal["ref_idc"],
                            "is_idr": nal["is_idr"],
                            "slice_type": nal["slice_type"],
                            "first_mb": nal["first_mb"],
                        }
                    )
            yield pd.DataFrame.from_records(
                rows, columns=[f.name for f in _NAL_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=_NAL_SCHEMA)


def with_synth_h264(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture stage: Annex-B stream with ``n_slices = 4 + id%8``."""

    @pandas_udf(BinaryType())
    def _synth(ids: pd.Series) -> pd.Series:
        return pd.Series([synth_h264(int(i), 4 + int(i) % 8) for i in ids])

    return df.withColumn("data", _synth(F.col(id_col)))


# ---------------------------------------------------------------------------
# HEVC / H.265 (ISO/IEC 23008-2): same Annex-B byte-stream framing and
# the same emulation-prevention escape, but a 2-byte NAL header —
# forbidden(1) | nal_unit_type(6) | nuh_layer_id(6) | temporal_id+1(3)
# (§7.3.1.2). IRAP pictures are types 16-23 (IDR_W_RADL=19,
# IDR_N_LP=20, CRA=21); slice_type needs PPS state so the index stops
# at the PPS-free fields: the first_slice_segment_in_pic_flag (the
# first RBSP bit, §7.3.6.1) plus the header-level routing fields.
# ---------------------------------------------------------------------------

HEVC_TRAIL_R = 1
HEVC_IDR_W_RADL = 19
HEVC_IDR_N_LP = 20
HEVC_VPS = 32
HEVC_SPS = 33
HEVC_PPS = 34

_HEVC_VCL_MAX = 31  # nal_unit_type 0..31 are coded-slice (VCL) NALs
_HEVC_IRAP = frozenset(range(16, 24))


def parse_annexb_hevc(data: bytes):
    """-> list of HEVC NAL dicts, or None when no start code exists.

    Dict keys: ``offset`` / ``start_code_len`` / ``nal_len`` exactly as
    in :func:`parse_annexb`, plus ``nal_type``, ``nuh_layer_id``,
    ``temporal_id``, ``is_irap``, ``is_idr``, and for VCL NALs
    ``first_slice`` (the first_slice_segment_in_pic_flag bit; None for
    non-VCL or truncated payloads). NALs with the forbidden bit set,
    a truncated 2-byte header, or temporal_id_plus1 == 0 (forbidden by
    §7.4.2.2) are skipped.
    """
    extents = _annexb_extents(data)
    if extents is None:
        return None
    out = []
    for first, hdr_at, end in extents:
        if hdr_at + 2 > end:
            continue  # start code at EOF / truncated 2-byte header
        b0, b1 = data[hdr_at], data[hdr_at + 1]
        if b0 & 0x80:
            continue  # forbidden_zero_bit
        tid_plus1 = b1 & 0x07
        if tid_plus1 == 0:
            continue  # forbidden value
        nal_type = (b0 >> 1) & 0x3F
        rec = {
            "offset": first,
            "start_code_len": hdr_at - first,
            "nal_len": end - first,
            "nal_type": nal_type,
            "nuh_layer_id": ((b0 & 1) << 5) | (b1 >> 3),
            "temporal_id": tid_plus1 - 1,
            "is_irap": 1 if nal_type in _HEVC_IRAP else 0,
            "is_idr": 1 if nal_type in (HEVC_IDR_W_RADL, HEVC_IDR_N_LP) else 0,
            "first_slice": None,
        }
        if nal_type <= _HEVC_VCL_MAX and hdr_at + 2 < end:
            rec["first_slice"] = (data[hdr_at + 2] >> 7) & 1
        out.append(rec)
    return out


def synth_hevc_filler_len(doc_id: int, i: int) -> int:
    return 18 + (doc_id * 5 + i * 11) % 26


def synth_hevc(doc_id: int, n_slices: int) -> bytes:
    """Annex-B HEVC stream: VPS (4-byte prefix, 6-byte payload) + SPS
    (3-byte, 5) + PPS (3-byte, 4), then ``n_slices`` slice segments —
    IDR_W_RADL every 4th (temporal_id 0, 4-byte prefix) else TRAIL_R
    (temporal_id i%3, 3-byte prefix), first_slice flag always set.
    Every ODD slice carries a raw 0x000001 in its RBSP (escaped on the
    wire, +1 byte), mirroring the H.264 synth so the HEVC walk's
    offset arithmetic also only matches with real escape handling."""
    out = bytearray()
    out += b"\x00\x00\x00\x01" + bytes([HEVC_VPS << 1, 0x01])
    out += bytes(0x40 + (doc_id + j) % 0xBF for j in range(6))
    out += b"\x00\x00\x01" + bytes([HEVC_SPS << 1, 0x01])
    out += bytes(0x40 + (doc_id * 2 + j) % 0xBF for j in range(5))
    out += b"\x00\x00\x01" + bytes([HEVC_PPS << 1, 0x01])
    out += bytes(0x40 + (doc_id * 3 + j) % 0xBF for j in range(4))
    for i in range(n_slices):
        idr = i % 4 == 0
        ntype = HEVC_IDR_W_RADL if idr else HEVC_TRAIL_R
        tid = 0 if idr else i % 3
        out += b"\x00\x00\x00\x01" if idr else b"\x00\x00\x01"
        out += bytes([ntype << 1, tid + 1])
        rbsp = bytearray([0xB0])  # first_slice_segment_in_pic_flag = 1
        rbsp += bytes(
            0x40 + (doc_id * 7 + i * 3 + j) % 0xBF
            for j in range(synth_hevc_filler_len(doc_id, i))
        )
        if i % 2:
            rbsp += b"\x00\x00\x01\x80"
        out += escape_rbsp(bytes(rbsp))
    return bytes(out)


_HEVC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("nal_idx", IntegerType(), False),
        StructField("offset", LongType(), False),
        StructField("start_code_len", IntegerType(), False),
        StructField("nal_len", IntegerType(), False),
        StructField("nal_type", IntegerType(), False),
        StructField("nuh_layer_id", IntegerType(), False),
        StructField("temporal_id", IntegerType(), False),
        StructField("is_irap", IntegerType(), False),
        StructField("is_idr", IntegerType(), False),
        StructField("first_slice", IntegerType(), True),
    ]
)


def hevc_nal_index(
    df: DataFrame, data_col: str = "data", id_col: str = "doc_id"
) -> DataFrame:
    """One row per HEVC NAL unit with its exact byte extent + routing
    fields (IRAP/IDR, layer, temporal sub-layer). Arrow-batched
    mapInPandas, bytes never shuffle; undecodable payloads emit
    nothing. Temporal-ID rows make bitrate-laddering (drop tid>k) a
    pure filter over this index — no codec involved."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for d, v in zip(b[id_col], b[data_col]):
                nals = parse_annexb_hevc(bytes(v)) if v is not None else None
                for k, nal in enumerate(nals or ()):
                    rows.append(
                        {
                            "doc_id": int(d),
                            "nal_idx": k,
                            "offset": nal["offset"],
                            "start_code_len": nal["start_code_len"],
                            "nal_len": nal["nal_len"],
                            "nal_type": nal["nal_type"],
                            "nuh_layer_id": nal["nuh_layer_id"],
                            "temporal_id": nal["temporal_id"],
                            "is_irap": nal["is_irap"],
                            "is_idr": nal["is_idr"],
                            "first_slice": nal["first_slice"],
                        }
                    )
            yield pd.DataFrame.from_records(
                rows, columns=[f.name for f in _HEVC_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=_HEVC_SCHEMA)


def with_synth_hevc(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture stage: HEVC Annex-B stream with ``n_slices = 4 + id%8``."""

    @pandas_udf(BinaryType())
    def _synth(ids: pd.Series) -> pd.Series:
        return pd.Series([synth_hevc(int(i), 4 + int(i) % 8) for i in ids])

    return df.withColumn("data", _synth(F.col(id_col)))
