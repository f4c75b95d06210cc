"""FLAC stream index — REAL metadata-block walk + CRC-verified frame
boundary scan, codec-free (RFC 9639 / the published xiph FLAC format).

Subframe sample decode needs the residual/Rice codec; the STREAM
STRUCTURE does not: the ``fLaC`` magic, the 4-byte metadata block
headers, the 34-byte STREAMINFO bit layout, and the frame headers
(14-bit sync, blocksize/rate/channel codes, extended-UTF-8 coded frame
number, CRC-8) are all fixed published byte layouts. Unlike MP3/ADTS,
a FLAC frame header does NOT carry the frame's byte length, so the
index walks sync candidates and accepts a boundary only when BOTH the
candidate header's CRC-8 and the finished frame's trailing CRC-16
(poly 0x8005, over everything before it) verify — the same resync
discipline a seeking decoder uses, and exactly the per-frame byte
extents a 100 TB audio pipeline fans out to workers before any codec
runs. Completes the bare-audio family next to MP3 (audio.py), ADTS
(audio.py), and Ogg (audio.py).

Operators (Arrow ``mapInPandas`` on the scan layout — payload bytes
never shuffle; malformed payloads yield nothing, never a stage
failure):

- ``flac_block_index``: one row per metadata block (type, extent,
  is_last) with the STREAMINFO fields (rate/channels/bits/total
  samples) parsed onto type-0 rows.
- ``flac_frame_index``: one row per CRC-verified audio frame with its
  exact byte extent and the per-frame header fields (blocksize,
  sample rate, channels, coded frame number).

Reference scope: the reference repo has no audio path (SURVEY.md
§2.8); this module is part of the beyond-reference multimodal mandate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

__all__ = [
    "parse_flac_blocks",
    "parse_flac_frames",
    "flac_block_index",
    "flac_frame_index",
    "synth_flac",
    "with_synth_flac",
]

# ---------------------------------------------------------------------------
# CRCs (FLAC frame header CRC-8 poly 0x07; frame CRC-16 poly 0x8005,
# both init 0, unreflected — the published FLAC polynomials)
# ---------------------------------------------------------------------------

_CRC8_TABLE: list[int] = []
_CRC16_TABLE: list[int] = []


def _crc8(data: bytes) -> int:
    if not _CRC8_TABLE:
        for i in range(256):
            r = i
            for _ in range(8):
                r = ((r << 1) ^ 0x07) if r & 0x80 else (r << 1)
            _CRC8_TABLE.append(r & 0xFF)
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    if not _CRC16_TABLE:
        for i in range(256):
            r = i << 8
            for _ in range(8):
                r = ((r << 1) ^ 0x8005) if r & 0x8000 else (r << 1)
            _CRC16_TABLE.append(r & 0xFFFF)
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[((crc >> 8) & 0xFF) ^ b]
    return crc


# ---------------------------------------------------------------------------
# frame-header field tables (published FLAC code tables)
# ---------------------------------------------------------------------------

# sample-rate code -> Hz; None = needs streaminfo (0) or extra bytes
# (12/13/14) or invalid (15)
_FLAC_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def _utf8_code(n: int) -> bytes:
    """FLAC's extended-UTF-8 coded number (frame/sample number)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbits = n.bit_length()
    for total in range(2, 8):
        if nbits <= 1 + 5 * total:  # (7 - total) lead bits + 6*(total-1)
            lead = (0xFF << (8 - total)) & 0xFF
            shift = 6 * (total - 1)
            out.append(lead | (n >> shift))
            for k in range(total - 1):
                shift -= 6
                out.append(0x80 | ((n >> shift) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large")


def _utf8_decode(data: bytes, pos: int):
    """-> (value, n_bytes) or None on malformed coding/truncation."""
    if pos >= len(data):
        return None
    b0 = data[pos]
    if b0 < 0x80:
        return b0, 1
    total = 0
    for t in range(2, 8):
        mask = (0xFF << (8 - t - 1)) & 0xFF
        lead = (0xFF << (8 - t)) & 0xFF
        if (b0 & mask) == lead:
            total = t
            break
    if not total or pos + total > len(data):
        return None
    val = b0 & (0x7F >> total)
    for k in range(1, total):
        bk = data[pos + k]
        if (bk & 0xC0) != 0x80:
            return None
        val = (val << 6) | (bk & 0x3F)
    return val, total


def _parse_frame_header(data: bytes, pos: int):
    """Validate + decode the frame header at ``pos`` -> (header_len,
    blocksize, sample_rate_hz, channels, frame_number) or None.
    sample_rate_hz is 0 when the header defers to STREAMINFO (code 0).
    The trailing CRC-8 must match (the spec's own integrity check)."""
    n = len(data)
    if pos + 5 > n or data[pos] != 0xFF or (data[pos + 1] & 0xFE) != 0xF8:
        return None
    b2, b3 = data[pos + 2], data[pos + 3]
    bs_code, sr_code = b2 >> 4, b2 & 0x0F
    ch_code, ss_code = b3 >> 4, (b3 >> 1) & 0x07
    if bs_code == 0 or sr_code == 15 or ss_code == 3 or ch_code > 10:
        return None
    if b3 & 0x01:  # reserved bit must be 0
        return None
    dec = _utf8_decode(data, pos + 4)
    if dec is None:
        return None
    frame_no, utf_len = dec
    cur = pos + 4 + utf_len
    # explicit blocksize bytes
    if bs_code == 1:
        blocksize = 192
    elif 2 <= bs_code <= 5:
        blocksize = 576 << (bs_code - 2)
    elif bs_code == 6:
        if cur + 1 > n:
            return None
        blocksize = data[cur] + 1
        cur += 1
    elif bs_code == 7:
        if cur + 2 > n:
            return None
        blocksize = int.from_bytes(data[cur : cur + 2], "big") + 1
        cur += 2
    else:
        blocksize = 256 << (bs_code - 8)
    # explicit sample-rate bytes
    if sr_code == 0:
        rate = 0  # from STREAMINFO
    elif sr_code in _FLAC_RATES:
        rate = _FLAC_RATES[sr_code]
    elif sr_code == 12:
        if cur + 1 > n:
            return None
        rate = data[cur] * 1000
        cur += 1
    else:  # 13 / 14: 16-bit Hz or Hz/10
        if cur + 2 > n:
            return None
        v = int.from_bytes(data[cur : cur + 2], "big")
        rate = v if sr_code == 13 else v * 10
        cur += 2
    if cur + 1 > n or _crc8(data[pos:cur]) != data[cur]:
        return None
    channels = ch_code + 1 if ch_code < 8 else 2  # 8-10: stereo modes
    return cur + 1 - pos, blocksize, rate, channels, frame_no


def parse_flac_blocks(data: bytes):
    """Walk metadata blocks -> [(block_idx, block_type, is_last,
    body_offset, block_len, sample_rate, channels, bits, total_samples)]
    or None when not a FLAC stream. The STREAMINFO bit fields (20-bit
    rate, 3-bit channels-1, 5-bit bits-1, 36-bit total samples) are
    parsed onto type-0 rows; other types carry None for them. A block
    whose declared length overruns the payload ends the walk (valid
    prefix kept), like the truncated-tail rules in the MP3/Ogg walks."""
    n = len(data)
    if n < 8 or data[:4] != b"fLaC":
        return None
    pos = 4
    blocks = []
    while pos + 4 <= n:
        hdr = data[pos]
        is_last = hdr >> 7
        btype = hdr & 0x7F
        if btype == 127:  # forbidden value per spec
            break
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = pos + 4
        if body + length > n:
            break
        rate = ch = bits = total = None
        if btype == 0 and length >= 34:
            packed = int.from_bytes(data[body + 10 : body + 18], "big")
            rate = packed >> 44
            ch = ((packed >> 41) & 0x07) + 1
            bits = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
        blocks.append(
            (len(blocks), btype, is_last, body, length, rate, ch, bits, total)
        )
        pos = body + length
        if is_last:
            break
    return blocks or None


def parse_flac_frames(data: bytes):
    """Walk audio frames -> [(frame_idx, offset, frame_len, blocksize,
    sample_rate, channels, frame_number)] or None when no verified
    frame exists. A boundary is accepted only when the next sync
    candidate carries a CRC-8-valid header AND the finished frame's
    trailing 16-bit CRC (big-endian, over everything before it)
    verifies — so filler bytes that merely look like a sync word can't
    split a frame. A final frame whose CRC-16 fails (truncation or
    corruption) is dropped, keeping the verified prefix."""
    blocks = parse_flac_blocks(data)
    if not blocks:
        return None
    last = blocks[-1]
    pos = last[3] + last[4]  # first byte after the last metadata block
    n = len(data)
    frames = []
    hdr = _parse_frame_header(data, pos)
    while hdr is not None and pos < n:
        hdr_len, bs, rate, ch, fno = hdr
        # scan for the next verified boundary
        scan = pos + hdr_len + 1
        nxt = None
        nxt_hdr = None
        while True:
            cand = data.find(b"\xff", scan)
            if cand < 0 or cand + 2 > n:
                break
            if (data[cand + 1] & 0xFE) == 0xF8 and cand - 2 > pos:
                h = _parse_frame_header(data, cand)
                if h is not None and _crc16(data[pos : cand - 2]) == int.from_bytes(
                    data[cand - 2 : cand], "big"
                ):
                    nxt, nxt_hdr = cand, h
                    break
            scan = cand + 1
        if nxt is None:
            # stream end: the last frame must still CRC-verify
            if n - 2 > pos and _crc16(data[pos : n - 2]) == int.from_bytes(
                data[n - 2 : n], "big"
            ):
                frames.append((len(frames), pos, n - pos, bs, rate, ch, fno))
            break
        frames.append((len(frames), pos, nxt - pos, bs, rate, ch, fno))
        pos, hdr = nxt, nxt_hdr
    return frames or None


# ---------------------------------------------------------------------------
# deterministic fixture (the byte-level inverse the oracle replays)
# ---------------------------------------------------------------------------


def synth_flac_payload_len(doc_id: int, i: int) -> int:
    return 20 + (doc_id * 7 + i * 11) % 50


def synth_flac(doc_id: int, n_frames: int) -> bytes:
    """A structurally valid FLAC stream with real CRC-8/CRC-16: a
    34-byte STREAMINFO (rate ``8000*(1+id%3)``, channels ``1+id%2``,
    16-bit, ``1000+(id*37)%5000`` total samples), one is-last PADDING
    block of ``8+id%16`` bytes, then ``n_frames`` frames whose headers
    are pure formulas — blocksize code 6 (8-bit, ``64+(id*3+i*7)%128``),
    rate code ``8+i%4`` (32/44.1/48/96 kHz), channel code ``(id+i)%2``,
    coded frame number ``i`` — over ``synth_flac_payload_len`` filler
    bytes drawn mod 255 (never 0xFF, so the only sync words are real
    ones; the CRC-16 boundary rule is still what the parser trusts)."""
    rate = 8000 * (1 + doc_id % 3)
    ch = 1 + doc_id % 2
    total = 1000 + (doc_id * 37) % 5000
    packed = (rate << 44) | ((ch - 1) << 41) | (15 << 36) | total
    si = (
        (4096).to_bytes(2, "big") * 2
        + b"\x00\x00\x00" * 2
        + packed.to_bytes(8, "big")
        + bytes((doc_id + k) % 251 for k in range(16))  # MD5 slot (filler)
    )
    assert len(si) == 34
    out = bytearray(b"fLaC")
    out += bytes([0x00]) + len(si).to_bytes(3, "big") + si
    pad = 8 + doc_id % 16
    out += bytes([0x80 | 0x01]) + pad.to_bytes(3, "big") + bytes(pad)
    for i in range(n_frames):
        hdr = bytearray([0xFF, 0xF8])
        hdr.append((6 << 4) | (8 + i % 4))
        hdr.append((((doc_id + i) % 2) << 4) | (4 << 1))
        hdr += _utf8_code(i)
        hdr.append((64 + (doc_id * 3 + i * 7) % 128) - 1)
        hdr.append(_crc8(bytes(hdr)))
        payload = bytes(
            (doc_id * 5 + i * 3 + k) % 255
            for k in range(synth_flac_payload_len(doc_id, i))
        )
        frame = bytes(hdr) + payload
        out += frame + _crc16(frame).to_bytes(2, "big")
    return bytes(out)


def with_synth_flac(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture stage: FLAC stream with ``n_frames = 3 + id%6``."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def _synth(ids: pd.Series) -> pd.Series:
        return pd.Series([synth_flac(int(i), 3 + int(i) % 6) for i in ids])

    return df.withColumn("data", _synth(F.col(id_col)))


# ---------------------------------------------------------------------------
# Spark stages
# ---------------------------------------------------------------------------

_BLOCK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("block_idx", IntegerType(), False),
        StructField("block_type", IntegerType(), False),
        StructField("is_last", IntegerType(), False),
        StructField("offset", LongType(), False),
        StructField("block_len", IntegerType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("bits", IntegerType(), True),
        StructField("total_samples", LongType(), True),
    ]
)


def flac_block_index(
    df: DataFrame, data_col: str = "data", id_col: str = "doc_id"
) -> DataFrame:
    """One row per FLAC metadata block with its body byte extent, plus
    the STREAMINFO audio parameters on type-0 rows. One Arrow pass on
    the scan layout; non-FLAC payloads emit nothing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for d, v in zip(b[id_col], b[data_col]):
                blks = parse_flac_blocks(bytes(v)) if v is not None else None
                for idx, bt, last, off, ln, sr, ch, bits, tot in blks or ():
                    rows.append((int(d), idx, bt, last, off, ln, sr, ch, bits, tot))
            yield pd.DataFrame.from_records(
                rows, columns=[f.name for f in _BLOCK_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=_BLOCK_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("offset", LongType(), False),
        StructField("frame_len", IntegerType(), False),
        StructField("blocksize", IntegerType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("channels", IntegerType(), False),
        StructField("frame_number", LongType(), False),
    ]
)


def flac_frame_index(
    df: DataFrame, data_col: str = "data", id_col: str = "doc_id"
) -> DataFrame:
    """One row per CRC-verified FLAC audio frame with its exact byte
    extent and per-frame header fields. One Arrow pass on the scan
    layout; undecodable payloads emit nothing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for d, v in zip(b[id_col], b[data_col]):
                fr = parse_flac_frames(bytes(v)) if v is not None else None
                for idx, off, ln, bs, sr, ch, fno in fr or ():
                    rows.append((int(d), idx, off, ln, bs, sr, ch, fno))
            yield pd.DataFrame.from_records(
                rows, columns=[f.name for f in _FRAME_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=_FRAME_SCHEMA)
