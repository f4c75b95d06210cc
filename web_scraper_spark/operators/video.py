"""REAL video container decode — ISO BMFF (MP4) structure, codec-free.

The video analog of ``rawmedia.gif_frames``: pixel data needs codecs
this container lacks (H.264/VP9/AV1), but the CONTAINER is a published
standard (ISO/IEC 14496-12) whose box structure alone yields everything
a 100 TB video pipeline needs BEFORE any codec touches bytes — which
tracks exist, their codec fourcc and dimensions, and the exact byte
extent of every sample (frame) including which ones are sync samples
(keyframes). That index is what drives distributed byte-range frame
sampling: fan out (doc, offset, length) rows, then hand only those
ranges to a decoder.

- ``parse_mp4``: box walk (32-bit and 64-bit ``largesize`` boxes,
  container recursion moov/trak/mdia/minf/stbl), per track: handler
  (``hdlr``), codec fourcc + dimensions (``stsd``/``tkhd``), timescale
  and duration (``mdhd``), and the full sample-table resolution —
  ``stsc`` (sample→chunk runs) x ``stsz`` (sizes) x ``stco``/``co64``
  (chunk offsets) → exact per-sample byte offsets, plus ``stss`` sync
  sample marks. Moov-only files (DASH init-style) parse fine: the
  index never requires the ``mdat`` payload bytes.
- ``mp4_track_index`` / ``mp4_frame_index``: Arrow ``mapInPandas``
  stages over binary payloads — one row per track / per (sampled)
  frame with real byte extents. Malformed payloads yield nothing.
- ``synth_mp4``: deterministic builder whose sample sizes, chunk
  offsets, and keyframe cadence are pure integer formulas of
  ``(doc_id, i)`` — the DuckDB battery oracle replays the offset
  arithmetic (cumulative sums within stsc chunk runs) in SQL without
  ever seeing a box.
- ``parse_webm`` / ``webm_frame_index``: the same for WebM/Matroska
  (EBML, RFC 8794): variable-length-integer element walk, track
  metadata (codec id, dimensions), and per-frame coded-byte extents +
  keyframe flags from Cluster/SimpleBlock. MP4 + WebM covers
  essentially all web video containers.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "parse_mp4",
    "mp4_sample_offsets",
    "synth_mp4",
    "mp4_track_index",
    "mp4_frame_index",
    "with_synth_mp4",
    "parse_webm",
    "synth_webm",
    "webm_frame_index",
    "with_synth_webm",
]

# shared with the rest of the raw-media tier and the battery oracles
_MULT = 2654435761
_STRIDE = 40503

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for the boxes in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos : pos + 4], "big")
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            size = int.from_bytes(data[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < body - pos or pos + size > end:
            return  # malformed: stop cleanly
        yield btype, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _boxes(data, start, end):
        if t == btype:
            return b, e
    return None


def parse_mp4(data: bytes):
    """-> list of track dicts, or None when not an ISO BMFF file.

    Track dict keys: ``track_id, handler, codec, width, height,
    timescale, duration, sizes (list), chunk_offsets (list),
    stsc (list of (first_chunk, samples_per_chunk)), sync (set of
    0-based sample indices, empty = all sync per spec)``.
    """
    n = len(data)
    head = _find(data, 0, n, b"ftyp")
    if head is None:
        return None
    moov = _find(data, 0, n, b"moov")
    if moov is None:
        return None
    tracks = []
    for t, b, e in _boxes(data, moov[0], moov[1]):
        if t != b"trak":
            continue
        trk: dict = {
            "track_id": None,
            "handler": None,
            "codec": None,
            "width": None,
            "height": None,
            "timescale": None,
            "duration": None,
            "sizes": [],
            "chunk_offsets": [],
            "stsc": [],
            "sync": set(),
        }
        tkhd = _find(data, b, e, b"tkhd")
        if tkhd is not None:
            tb, te = tkhd
            version = data[tb]
            # after version+flags: v0 times are 4+4 bytes, v1 8+8 —
            # track id at +12 / +20 from the payload start. width/
            # height are the last two 16.16 fixed-point fields.
            idoff = tb + (20 if version else 12)
            if idoff + 4 <= te:
                trk["track_id"] = int.from_bytes(data[idoff : idoff + 4], "big")
            if te - 8 >= tb:
                trk["width"] = int.from_bytes(data[te - 8 : te - 4], "big") >> 16
                trk["height"] = int.from_bytes(data[te - 4 : te], "big") >> 16
        mdia = _find(data, b, e, b"mdia")
        if mdia is None:
            continue
        mb, me = mdia
        mdhd = _find(data, mb, me, b"mdhd")
        if mdhd is not None:
            hb, he = mdhd
            version = data[hb]
            if version == 1 and hb + 32 <= he:
                trk["timescale"] = int.from_bytes(data[hb + 20 : hb + 24], "big")
                trk["duration"] = int.from_bytes(data[hb + 24 : hb + 32], "big")
            elif hb + 20 <= he:
                trk["timescale"] = int.from_bytes(data[hb + 12 : hb + 16], "big")
                trk["duration"] = int.from_bytes(data[hb + 16 : hb + 20], "big")
        hdlr = _find(data, mb, me, b"hdlr")
        if hdlr is not None:
            hb, he = hdlr
            if hb + 12 <= he:
                trk["handler"] = data[hb + 8 : hb + 12].decode("ascii", "replace")
        minf = _find(data, mb, me, b"minf")
        if minf is None:
            continue
        stbl = _find(data, minf[0], minf[1], b"stbl")
        if stbl is None:
            continue
        sb, se = stbl
        stsd = _find(data, sb, se, b"stsd")
        if stsd is not None:
            db, de = stsd
            if db + 16 <= de:
                trk["codec"] = data[db + 12 : db + 16].decode("ascii", "replace")
        stsz = _find(data, sb, se, b"stsz")
        if stsz is not None:
            zb, ze = stsz
            if zb + 12 <= ze:
                fixed = int.from_bytes(data[zb + 4 : zb + 8], "big")
                count = int.from_bytes(data[zb + 8 : zb + 12], "big")
                if fixed:
                    # count comes from 4 untrusted bytes (up to 2^32);
                    # every sample occupies >=1 byte of the container, so
                    # a count beyond the payload length is malformed —
                    # reject instead of allocating a multi-GB list
                    if count > len(data):
                        return None
                    trk["sizes"] = [fixed] * count
                else:
                    if zb + 12 + 4 * count > ze:
                        return None
                    trk["sizes"] = [
                        int.from_bytes(data[zb + 12 + 4 * i : zb + 16 + 4 * i], "big")
                        for i in range(count)
                    ]
        stco = _find(data, sb, se, b"stco")
        co64 = _find(data, sb, se, b"co64")
        if stco is not None or co64 is not None:
            cb, ce = stco if stco is not None else co64
            wordlen = 4 if stco is not None else 8
            cnt = int.from_bytes(data[cb + 4 : cb + 8], "big")
            if cb + 8 + wordlen * cnt > ce:
                return None
            trk["chunk_offsets"] = [
                int.from_bytes(
                    data[cb + 8 + wordlen * i : cb + 8 + wordlen * (i + 1)], "big"
                )
                for i in range(cnt)
            ]
        stsc = _find(data, sb, se, b"stsc")
        if stsc is not None:
            cb, ce = stsc
            cnt = int.from_bytes(data[cb + 4 : cb + 8], "big")
            if cb + 8 + 12 * cnt > ce:
                return None
            trk["stsc"] = [
                (
                    int.from_bytes(data[cb + 8 + 12 * i : cb + 12 + 12 * i], "big"),
                    int.from_bytes(data[cb + 12 + 12 * i : cb + 16 + 12 * i], "big"),
                )
                for i in range(cnt)
            ]
        stss = _find(data, sb, se, b"stss")
        if stss is not None:
            yb, ye = stss
            cnt = int.from_bytes(data[yb + 4 : yb + 8], "big")
            if yb + 8 + 4 * cnt > ye:
                return None
            trk["sync"] = {
                int.from_bytes(data[yb + 8 + 4 * i : yb + 12 + 4 * i], "big") - 1
                for i in range(cnt)
            }
        tracks.append(trk)
    return tracks


def mp4_sample_offsets(trk: dict):
    """Resolve the stsc x stsz x stco tables -> [(offset, size)] per
    sample (§8.7 of ISO 14496-12): stsc runs say how many samples each
    chunk holds; a sample's offset is its chunk's offset plus the sizes
    of the samples before it in that chunk."""
    sizes = trk["sizes"]
    chunks = trk["chunk_offsets"]
    stsc = trk["stsc"]
    if not sizes or not chunks or not stsc:
        return None
    out = []
    si = 0
    n_chunks = len(chunks)
    for run_i, (first, per) in enumerate(stsc):
        last = (
            stsc[run_i + 1][0] - 1 if run_i + 1 < len(stsc) else n_chunks
        )
        for c in range(first - 1, last):
            if c >= n_chunks or si >= len(sizes):
                break
            off = chunks[c]
            for _ in range(per):
                if si >= len(sizes):
                    break
                out.append((off, sizes[si]))
                off += sizes[si]
                si += 1
    return out if len(out) == len(sizes) else None


# ---------------------------------------------------------------------------
# deterministic synth (formula-replayable index)
# ---------------------------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, payload: bytes, version: int = 0) -> bytes:
    return _box(btype, bytes([version, 0, 0, 0]) + payload)


def synth_sample_size(doc_id: int, i: int) -> int:
    return 100 + (doc_id * 3 + i * 7) % 50


def synth_chunk_offset(doc_id: int, c: int) -> int:
    return 1000 + c * 5000 + (doc_id % 11) * 8


def synth_mp4(doc_id: int, n_samples: int, samples_per_chunk: int = 3) -> bytes:
    """A valid moov-only MP4 (DASH-init style) with ONE video track:
    ``stsz[i] = 100 + (doc_id*3 + i*7) % 50``, chunk ``c`` at offset
    ``1000 + c*5000 + (doc_id%11)*8`` holding ``samples_per_chunk``
    samples (last chunk ragged), keyframes every 4th sample,
    ``timescale = 1000 + (doc_id%7)*100``, width/height =
    ``16*(1+id%5) x 16*(1+id%3)`` — every field a pure formula."""
    timescale = 1000 + (doc_id % 7) * 100
    w, h = 16 * (1 + doc_id % 5), 16 * (1 + doc_id % 3)
    sizes = [synth_sample_size(doc_id, i) for i in range(n_samples)]
    n_chunks = -(-n_samples // samples_per_chunk)
    offsets = [synth_chunk_offset(doc_id, c) for c in range(n_chunks)]
    sync = list(range(0, n_samples, 4))

    tkhd = (
        bytes(8)  # times
        + struct.pack(">I", 1)  # track id
        + bytes(4)  # reserved
        + struct.pack(">I", 0)  # duration
        + bytes(8 + 2 + 2 + 2 + 2)  # reserved/layer/group/volume/pad
        + bytes(36)  # identity matrix slot (zeros fine for index use)
        + struct.pack(">II", w << 16, h << 16)
    )
    mdhd = struct.pack(">IIIIHH", 0, 0, timescale, n_samples * (timescale // 10), 0x55C4, 0)
    hdlr = bytes(4) + b"vide" + bytes(12) + b"idx\x00"
    stsd = struct.pack(">I", 1) + _box(b"fk01", bytes(8))  # fourcc "fk01"
    stts = struct.pack(">I", 1) + struct.pack(">II", n_samples, timescale // 10)
    stsc = struct.pack(">I", 1) + struct.pack(">III", 1, samples_per_chunk, 1)
    stsz = struct.pack(">II", 0, n_samples) + b"".join(
        struct.pack(">I", s) for s in sizes
    )
    stco = struct.pack(">I", n_chunks) + b"".join(
        struct.pack(">I", o) for o in offsets
    )
    stss = struct.pack(">I", len(sync)) + b"".join(
        struct.pack(">I", s + 1) for s in sync
    )
    stbl = (
        _full(b"stsd", stsd)
        + _full(b"stts", stts)
        + _full(b"stsc", stsc)
        + _full(b"stsz", stsz)
        + _full(b"stco", stco)
        + _full(b"stss", stss)
    )
    minf = _box(b"minf", _box(b"stbl", stbl))
    mdia = _box(b"mdia", _full(b"mdhd", mdhd) + _full(b"hdlr", hdlr) + minf)
    trak = _box(b"trak", _full(b"tkhd", tkhd) + mdia)
    moov = _box(b"moov", trak)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    return ftyp + moov


# ---------------------------------------------------------------------------
# Spark stages
# ---------------------------------------------------------------------------

_TRACK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("track_id", IntegerType(), True),
        StructField("handler", StringType(), True),
        StructField("codec", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("timescale", IntegerType(), True),
        StructField("duration", LongType(), True),
        StructField("n_samples", IntegerType(), True),
        StructField("n_keyframes", IntegerType(), True),
    ]
)


def mp4_track_index(
    df: DataFrame, data_col: str = "data", id_col: str = "doc_id"
) -> DataFrame:
    """One row per MP4 track with real container metadata; undecodable
    payloads emit nothing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for d, v in zip(b[id_col], b[data_col]):
                tracks = parse_mp4(bytes(v)) if v is not None else None
                for t in tracks or ():
                    rows.append(
                        {
                            "doc_id": int(d),
                            "track_id": t["track_id"],
                            "handler": t["handler"],
                            "codec": t["codec"],
                            "width": t["width"],
                            "height": t["height"],
                            "timescale": t["timescale"],
                            "duration": t["duration"],
                            "n_samples": len(t["sizes"]),
                            "n_keyframes": len(t["sync"]),
                        }
                    )
            yield pd.DataFrame.from_records(
                rows, columns=[f.name for f in _TRACK_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=_TRACK_SCHEMA)


_FRAMEIDX_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("offset", LongType(), False),
        StructField("frame_len", IntegerType(), False),
        StructField("is_keyframe", IntegerType(), False),
    ]
)


def mp4_frame_index(
    df: DataFrame,
    data_col: str = "data",
    id_col: str = "doc_id",
    keyframes_only: bool = False,
) -> DataFrame:
    """The real distributed frame-sampling index: one row per sample
    (frame) of the FIRST video track with its exact byte extent —
    ``(offset, frame_len)`` resolved from stsc x stsz x stco — and the
    stss keyframe mark. This is what a 100 TB video pipeline fans out
    before any codec runs; decoders then read only the sampled byte
    ranges."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for d, v in zip(b[id_col], b[data_col]):
                tracks = parse_mp4(bytes(v)) if v is not None else None
                vid = next(
                    (t for t in tracks or () if t["handler"] == "vide"), None
                )
                if vid is None:
                    continue
                offs = mp4_sample_offsets(vid)
                if offs is None:
                    continue
                sync = vid["sync"]
                for i, (off, size) in enumerate(offs):
                    kf = 1 if (not sync or i in sync) else 0
                    if keyframes_only and not kf:
                        continue
                    rows.append((int(d), i, off, size, kf))
            yield pd.DataFrame.from_records(
                rows, columns=[f.name for f in _FRAMEIDX_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=_FRAMEIDX_SCHEMA)


def with_synth_mp4(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture stage: moov-only MP4 with ``n_samples = 5 + id%9``."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def _synth(ids: pd.Series) -> pd.Series:
        return pd.Series([synth_mp4(int(i), 5 + int(i) % 9) for i in ids])

    return df.withColumn("data", _synth(F.col(id_col)))


# ---------------------------------------------------------------------------
# WebM / Matroska (EBML, RFC 8794 + Matroska spec) — REAL container
# walk: tracks + per-frame byte extents from Cluster/SimpleBlock.
# Together with the ISO BMFF walk above this covers essentially all
# web video containers, codec-free.
# ---------------------------------------------------------------------------

_EBML_HEADER = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO_EL = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3


def _vint(data: bytes, pos: int, keep_marker: bool):
    """EBML variable-length integer -> (value, next_pos) or None."""
    if pos >= len(data):
        return None
    b0 = data[pos]
    if b0 == 0:
        return None
    length = 1
    mask = 0x80
    while not (b0 & mask):
        mask >>= 1
        length += 1
    if pos + length > len(data):
        return None
    val = b0 if keep_marker else (b0 & (mask - 1))
    for k in range(1, length):
        val = (val << 8) | data[pos + k]
    if not keep_marker and val == (1 << (7 * length)) - 1:
        val = -1  # unknown size
    return val, pos + length


def _ebml_children(data: bytes, start: int, end: int):
    """Yield (element_id, body_start, body_end) within [start, end)."""
    pos = start
    while pos < end:
        r = _vint(data, pos, True)
        if r is None:
            return
        eid, pos = r
        r = _vint(data, pos, False)
        if r is None:
            return
        size, pos = r
        body_end = end if size < 0 else pos + size
        if body_end > end:
            return
        yield eid, pos, body_end
        pos = body_end


def _uint(data: bytes, b: int, e: int) -> int:
    return int.from_bytes(data[b:e], "big")


def parse_webm(data: bytes):
    """-> {"timescale_ns", "tracks": [...], "frames": [...]} or None.

    tracks: (number, track_type, codec, width, height); frames:
    (track, timestamp_ticks, offset, size, keyframe) where
    ``offset/size`` is the coded frame's exact byte extent inside the
    SimpleBlock (what a decoder would be handed) and timestamp =
    cluster timestamp + block relative timestamp."""
    if len(data) < 8 or _vint(data, 0, True) is None:
        return None
    top = list(_ebml_children(data, 0, len(data)))
    if not top or top[0][0] != _EBML_HEADER:
        return None
    seg = next(((b, e) for i, b, e in top if i == _SEGMENT), None)
    if seg is None:
        return None
    timescale = 1_000_000
    tracks = []
    frames = []
    for eid, b, e in _ebml_children(data, seg[0], seg[1]):
        if eid == _INFO:
            for i2, b2, e2 in _ebml_children(data, b, e):
                if i2 == _TIMESTAMP_SCALE:
                    timescale = _uint(data, b2, e2)
        elif eid == _TRACKS:
            for i2, b2, e2 in _ebml_children(data, b, e):
                if i2 != _TRACK_ENTRY:
                    continue
                num = ttype = w = h = None
                codec = None
                for i3, b3, e3 in _ebml_children(data, b2, e2):
                    if i3 == _TRACK_NUMBER:
                        num = _uint(data, b3, e3)
                    elif i3 == _TRACK_TYPE:
                        ttype = _uint(data, b3, e3)
                    elif i3 == _CODEC_ID:
                        codec = data[b3:e3].decode("ascii", "replace")
                    elif i3 == _VIDEO_EL:
                        for i4, b4, e4 in _ebml_children(data, b3, e3):
                            if i4 == _PIXEL_W:
                                w = _uint(data, b4, e4)
                            elif i4 == _PIXEL_H:
                                h = _uint(data, b4, e4)
                tracks.append((num, ttype, codec, w, h))
        elif eid == _CLUSTER:
            cts = 0
            for i2, b2, e2 in _ebml_children(data, b, e):
                if i2 == _CLUSTER_TS:
                    cts = _uint(data, b2, e2)
                elif i2 == _SIMPLE_BLOCK:
                    r = _vint(data, b2, False)
                    if r is None:
                        continue
                    tnum, p = r
                    if p + 3 > e2:
                        continue
                    rel = struct.unpack(">h", data[p : p + 2])[0]
                    flags = data[p + 2]
                    frames.append(
                        (
                            tnum,
                            cts + rel,
                            p + 3,
                            e2 - (p + 3),
                            1 if flags & 0x80 else 0,
                        )
                    )
    if not tracks:
        return None
    return {"timescale_ns": timescale, "tracks": tracks, "frames": frames}


def _ebml_el(eid_bytes: bytes, payload: bytes, size_len: int = 8) -> bytes:
    """Element with a fixed-width size field (1 or 8 bytes) so synth
    offsets stay closed-form for the SQL oracle."""
    if size_len == 1:
        return eid_bytes + bytes([0x80 | len(payload)]) + payload
    return (
        eid_bytes
        + bytes([0x01])
        + len(payload).to_bytes(7, "big")
        + payload
    )


def synth_webm_frame_len(doc_id: int, i: int) -> int:
    return 60 + (doc_id * 5 + i * 11) % 40


def synth_webm(doc_id: int, n_frames: int) -> bytes:
    """A valid WebM/EBML file with ONE video track (codec ``V_FK0``,
    ``width/height = 16*(1+id%5) x 16*(1+id%3)``) and clusters of 4
    SimpleBlocks (cluster c at timestamp ``c*200``, in-cluster frame k
    at relative ``k*50``, keyframe when ``k == 0``). Frame payload
    lengths are ``60 + (id*5 + i*11) % 40`` filler bytes. All size
    fields are fixed-width vints, so every frame's byte offset is the
    closed form the DuckDB oracle replays:
    ``102 + 16*(i//4 + 1) + 13*(i+1) + sum(len_j for j < i)``."""
    w, h = 16 * (1 + doc_id % 5), 16 * (1 + doc_id % 3)
    # fixed layout (ID(4)+size(8)+doctype(2+1+4) = 19 bytes) so the
    # closed-form offsets hold
    header = _ebml_el(b"\x1a\x45\xdf\xa3", b"\x42\x82\x84webm")
    info = _ebml_el(
        b"\x15\x49\xa9\x66",
        b"\x2a\xd7\xb1\x84" + (1_000_000).to_bytes(4, "big"),
    )
    video = _ebml_el(
        b"\xe0",
        b"\xb0\x82" + w.to_bytes(2, "big") + b"\xba\x82" + h.to_bytes(2, "big"),
    )
    entry = _ebml_el(
        b"\xae",
        b"\xd7\x81\x01" + b"\x83\x81\x01" + b"\x86\x85V_FK0" + video,
    )
    tracks = _ebml_el(b"\x16\x54\xae\x6b", entry)
    clusters = b""
    for c in range(-(-n_frames // 4)):
        body = b"\xe7\x82" + (c * 200).to_bytes(2, "big")
        for k in range(4):
            i = c * 4 + k
            if i >= n_frames:
                break
            ln = synth_webm_frame_len(doc_id, i)
            payload = (
                b"\x81"  # track 1 vint
                + struct.pack(">h", k * 50)
                + bytes([0x80 if k == 0 else 0x00])
                + bytes((doc_id + i + j) % 256 for j in range(ln))
            )
            body += _ebml_el(b"\xa3", payload)
        clusters += _ebml_el(b"\x1f\x43\xb6\x75", body)
    segment = _ebml_el(b"\x18\x53\x80\x67", info + tracks + clusters)
    return header + segment


_WEBM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("track", IntegerType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("timestamp_ticks", LongType(), False),
        StructField("offset", LongType(), False),
        StructField("frame_len", IntegerType(), False),
        StructField("is_keyframe", IntegerType(), False),
    ]
)


def webm_frame_index(
    df: DataFrame, data_col: str = "data", id_col: str = "doc_id"
) -> DataFrame:
    """One row per SimpleBlock frame with its exact coded-byte extent,
    timestamp (cluster + relative), and keyframe flag — the WebM twin
    of ``mp4_frame_index``. Undecodable payloads emit nothing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for d, v in zip(b[id_col], b[data_col]):
                parsed = parse_webm(bytes(v)) if v is not None else None
                for fi, (trk, ts, off, ln, kf) in enumerate(
                    (parsed or {}).get("frames", ())
                ):
                    rows.append((int(d), int(trk), fi, int(ts), off, ln, kf))
            yield pd.DataFrame.from_records(
                rows, columns=[f.name for f in _WEBM_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=_WEBM_SCHEMA)


def with_synth_webm(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture stage: WebM with ``n_frames = 5 + id%9``."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def _synth(ids: pd.Series) -> pd.Series:
        return pd.Series([synth_webm(int(i), 5 + int(i) % 9) for i in ids])

    return df.withColumn("data", _synth(F.col(id_col)))
