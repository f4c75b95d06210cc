"""WebP chunk index (operators/webp.py), SRT cue index
(operators/subtitles.py), and ID3v2 tag index (operators/id3.py):
formula parity sweeps, both ID3 frame-size encodings, malformed- and
crafted-payload refusals (no unbounded allocation from declared
sizes), and the Spark stage contracts (no shuffle; malformed rows
emit nothing, never a failure)."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from web_scraper_spark.operators.id3 import (
    id3_tag_index,
    parse_id3v2,
    synth_id3,
    with_synth_id3,
)
from web_scraper_spark.operators.subtitles import (
    parse_srt,
    srt_cue_index,
    synth_srt,
    with_synth_srt,
)
from web_scraper_spark.operators.webp import (
    parse_webp_chunks,
    synth_webp,
    webp_chunk_index,
    with_synth_webp,
)

# ---------------------------------------------------------------------------
# WebP
# ---------------------------------------------------------------------------


def _webp_expected(doc_id: int):
    w = 16 + (doc_id * 5) % 240
    h = 16 + (doc_id * 7) % 240
    form = doc_id % 3
    if form == 0:
        return [(0, "VP8 ", 20, 10 + doc_id % 21, w, h, 0, 0)]
    if form == 1:
        return [(0, "VP8L", 20, 5 + doc_id % 21, w, h, doc_id % 2, 1)]
    e9 = doc_id % 9
    return [
        (0, "VP8X", 20, 10, w, h, doc_id % 2, 0),
        (1, "EXIF", 38, 8 + e9, None, None, None, None),
        (2, "VP8 ", 54 + e9 + e9 % 2, 10 + (doc_id * 11) % 40, w, h, 0, 0),
    ]


def test_webp_parity_sweep():
    for doc_id in range(48):
        assert parse_webp_chunks(synth_webp(doc_id)) == _webp_expected(
            doc_id
        ), doc_id


def test_webp_refusals_and_bounds():
    assert parse_webp_chunks(None) is None
    assert parse_webp_chunks(b"") is None
    assert parse_webp_chunks(b"RIFF\x04\x00\x00\x00WAVE") is None  # not WebP
    data = synth_webp(8)  # form 2: three chunks
    # truncation mid-chunk keeps the verified prefix only
    got = parse_webp_chunks(data[:40])
    assert got == _webp_expected(8)[:1]
    # a crafted giant chunk size must end the walk, not allocate
    bad = bytearray(data)
    bad[16:20] = struct.pack("<I", 0x7FFFFFFF)
    assert parse_webp_chunks(bytes(bad)) is None
    # a non-ASCII fourcc ends the walk at the last good chunk
    bad = bytearray(data)
    bad[38 + _webp_expected(8)[1][3] + (_webp_expected(8)[1][3] & 1)] = 0xFF
    got = parse_webp_chunks(bytes(bad))
    assert got == _webp_expected(8)[:2]


def test_webp_header_variants():
    # inter-frame VP8 (tag bit0=1) carries no dimensions
    body = b"\x01\x00\x00\x9d\x01\x2a" + struct.pack("<HH", 99, 99)
    data = b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WEBP"
    data += b"VP8 " + struct.pack("<I", len(body)) + body
    assert parse_webp_chunks(data) == [
        (0, "VP8 ", 20, len(body), None, None, None, None)
    ]
    # VP8L with nonzero version bits is rejected (dims stay null)
    bits = (63) | (63 << 14) | (1 << 29)
    body = b"\x2f" + struct.pack("<I", bits)
    data = b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WEBP"
    data += b"VP8L" + struct.pack("<I", len(body)) + body
    assert parse_webp_chunks(data) == [
        (0, "VP8L", 20, len(body), None, None, None, None)
    ]


def test_webp_stage_no_shuffle(spark):
    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    out = webp_chunk_index(with_synth_webp(docs))
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for d in range(24):
        got = [
            (r.chunk_idx, r.fourcc, r.offset, r.chunk_len, r.width,
             r.height, r.has_alpha, r.lossless)
            for r in sorted(by_doc[d], key=lambda r: r.chunk_idx)
        ]
        assert got == _webp_expected(d), d
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# SRT
# ---------------------------------------------------------------------------


def _srt_expected(doc_id: int, n: int):
    rows = []
    for i in range(n):
        start = (doc_id % 4) * 900000 + i * 3000 + (doc_id % 9) * 77
        end = start + 800 + (doc_id * 17 + i * 23) % 2500
        nl = 1 + (doc_id + i) % 2
        text = "\n".join(f"sline{j} doc{doc_id} cue{i}" for j in range(nl))
        rows.append((i, i + 1, start, end, text, nl))
    return rows


def test_srt_parity_sweep():
    for doc_id in range(48):
        n = 3 + doc_id % 5
        assert parse_srt(synth_srt(doc_id, n)) == _srt_expected(
            doc_id, n
        ), doc_id


def test_srt_edges():
    assert parse_srt(None) is None
    assert parse_srt("no cues here") is None
    # missing sequence line -> seq = -1; dot decimal tolerated
    doc = "00:00:01.000 --> 00:00:02.000\nhi\n"
    assert parse_srt(doc) == [(0, -1, 1000, 2000, "hi", 1)]
    # BOM + CRLF + comma decimals + hour field
    doc = "﻿1\r\n01:00:01,500 --> 01:00:02,000\r\nhey\r\nthere\r\n"
    assert parse_srt(doc) == [(0, 1, 3601500, 3602000, "hey\nthere", 2)]
    # a cue whose end precedes its start is skipped, not fatal
    doc = (
        "1\n00:00:02,000 --> 00:00:01,000\nrewind\n\n"
        "2\n00:00:03,000 --> 00:00:04,000\nfine\n"
    )
    assert parse_srt(doc) == [(0, 2, 3000, 4000, "fine", 1)]
    # a block with a garbage timing line is skipped
    doc = "1\nnot a timestamp\nx\n\n2\n00:00:05,000 --> 00:00:06,000\ny\n"
    assert parse_srt(doc) == [(0, 2, 5000, 6000, "y", 1)]


def test_srt_stage_no_shuffle(spark):
    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    out = srt_cue_index(with_synth_srt(docs))
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for d in range(24):
        got = [
            (r.cue_idx, r.seq, r.start_ms, r.end_ms, r.text, r.n_lines)
            for r in sorted(by_doc[d], key=lambda r: r.cue_idx)
        ]
        assert got == _srt_expected(d, 3 + d % 5), d
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# ID3v2
# ---------------------------------------------------------------------------


def _id3_expected(doc_id: int):
    major = 3 + doc_id % 2
    tit = f"Title {doc_id % 100}"
    art = f"Artist {doc_id % 50}"
    alb = f"Album {doc_id % 20}"
    trk = str(1 + doc_id % 12)
    p0 = 1 + len(tit)
    p1 = 3 + 2 * len(art) if major == 3 else 1 + len(art)
    p2 = 1 + len(alb)
    return [
        (0, "TIT2", 10, p0, 0, tit),
        (1, "TPE1", 20 + p0, p1, 1 if major == 3 else 3, art),
        (2, "TALB", 30 + p0 + p1, p2, 0, alb),
        (3, "TRCK", 40 + p0 + p1 + p2, 1 + len(trk), 0, trk),
    ]


def test_id3_parity_sweep_both_size_encodings():
    for doc_id in range(48):  # even = v2.3 plain-BE, odd = v2.4 syncsafe
        assert parse_id3v2(synth_id3(doc_id)) == _id3_expected(doc_id), doc_id


def test_id3_refusals_and_bounds():
    assert parse_id3v2(None) is None
    assert parse_id3v2(b"") is None
    assert parse_id3v2(b"\xff\xfb\x90\x00" * 4) is None  # bare MPEG, no tag
    # v2.2 major is rejected (different frame layout)
    v22 = bytearray(synth_id3(2))
    v22[3] = 2
    assert parse_id3v2(bytes(v22)) is None
    # a non-syncsafe tag size byte rejects the header
    bad = bytearray(synth_id3(2))
    bad[6] = 0x80
    assert parse_id3v2(bytes(bad)) is None
    # a crafted frame size running past the tag ends the walk there
    data = synth_id3(2)  # v2.3: plain big-endian frame sizes
    bad = bytearray(data)
    bad[14:18] = struct.pack(">I", 0x7FFFFFFF)
    assert parse_id3v2(bytes(bad)) is None  # first frame already corrupt
    # truncation inside a later frame keeps the verified prefix
    want = _id3_expected(2)
    trunc = data[: want[2][2] + 5]  # cut mid-TALB
    assert parse_id3v2(trunc) == want[:2]


def test_id3_text_decode_edges():
    # unknown encoding byte -> frame indexed, value null
    frames = b"TXXX" + struct.pack(">I", 3) + b"\x00\x00" + b"\x09ab"
    n = len(frames)
    size = bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )
    data = b"ID3\x03\x00\x00" + size + frames
    assert parse_id3v2(data) == [(0, "TXXX", 10, 3, None, None)]
    # non-text frames never carry a decoded value
    frames = b"APIC" + struct.pack(">I", 4) + b"\x00\x00" + b"\x00img"
    n = len(frames)
    size = bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )
    data = b"ID3\x04\x00\x00" + size + frames
    assert parse_id3v2(data) == [(0, "APIC", 10, 4, None, None)]


def test_id3_stage_no_shuffle(spark):
    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    out = id3_tag_index(with_synth_id3(docs))
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for d in range(24):
        got = [
            (r.frame_idx, r.frame_id, r.offset, r.frame_len, r.encoding,
             r.value_s)
            for r in sorted(by_doc[d], key=lambda r: r.frame_idx)
        ]
        assert got == _id3_expected(d), d
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
