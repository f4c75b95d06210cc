"""FLAC stream index (operators/flac.py), EXIF extraction
(operators/exif.py), and WebVTT cue index (operators/subtitles.py):
formula parity sweeps, CRC boundary discipline, both TIFF byte
orders, malformed-payload refusals, and the Spark stage contracts
(no shuffle; malformed rows emit nothing, never a failure)."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_scraper_spark.operators.exif import (
    exif_index,
    parse_exif,
    synth_jpeg_exif,
    with_synth_exif,
)
from web_scraper_spark.operators.flac import (
    _crc8,
    _crc16,
    _utf8_code,
    _utf8_decode,
    flac_block_index,
    flac_frame_index,
    parse_flac_blocks,
    parse_flac_frames,
    synth_flac,
    synth_flac_payload_len,
    with_synth_flac,
)
from web_scraper_spark.operators.subtitles import (
    parse_webvtt,
    synth_webvtt,
    webvtt_cue_index,
    with_synth_webvtt,
)

# ---------------------------------------------------------------------------
# FLAC
# ---------------------------------------------------------------------------


def _flac_frames_expected(doc_id: int, n: int):
    rows, off = [], 54 + doc_id % 16
    for i in range(n):
        flen = 29 + (doc_id * 7 + i * 11) % 50
        rows.append(
            (
                i,
                off,
                flen,
                64 + (doc_id * 3 + i * 7) % 128,
                [32000, 44100, 48000, 96000][i % 4],
                1 + (doc_id + i) % 2,
                i,
            )
        )
        off += flen
    return rows, off


def test_flac_parity_sweep():
    for doc_id in range(48):
        n = 3 + doc_id % 6
        data = synth_flac(doc_id, n)
        blocks = parse_flac_blocks(data)
        assert blocks == [
            (
                0, 0, 0, 8, 34,
                8000 * (1 + doc_id % 3),
                1 + doc_id % 2,
                16,
                1000 + (doc_id * 37) % 5000,
            ),
            (1, 1, 1, 46, 8 + doc_id % 16, None, None, None, None),
        ], doc_id
        want, end = _flac_frames_expected(doc_id, n)
        assert end == len(data)  # extents tile the stream
        assert parse_flac_frames(data) == want, doc_id


def test_flac_crc_boundary_discipline():
    data = synth_flac(5, 4)
    # truncating the final CRC-16 drops ONLY the final frame
    assert len(parse_flac_frames(data[:-1])) == 3
    # corrupting a payload byte of the last frame breaks its CRC-16
    bad = bytearray(data)
    bad[-10] ^= 0x5A
    assert len(parse_flac_frames(bytes(bad))) == 3
    # corrupting a middle frame's header CRC-8 ends the walk there:
    # the walk keeps the verified prefix (frames 0) because frame 1's
    # boundary can no longer verify
    frames = parse_flac_frames(data)
    hdr_off = frames[1][1]
    bad = bytearray(data)
    bad[hdr_off + 6] ^= 0xFF  # CRC-8 byte of frame 1's header
    got = parse_flac_frames(bytes(bad))
    assert got is None or all(f[1] != hdr_off for f in got)
    # payload bytes that LOOK like a sync word cannot split a frame:
    # inject 0xFF 0xF8 into a payload; CRC-16 verification rejects it
    inj = bytearray(data)
    p = frames[2][1] + 8  # inside frame 2's payload
    inj[p : p + 2] = b"\xff\xf8"
    got = parse_flac_frames(bytes(inj))
    # frame 2's own CRC now fails, so the walk keeps frames 0-1 only
    assert [f[:2] for f in got] == [f[:2] for f in frames[:2]]


def test_flac_refusals_and_utf8():
    assert parse_flac_blocks(b"") is None
    assert parse_flac_blocks(b"junk") is None
    assert parse_flac_frames(b"fLaC") is None
    # block length overrunning the payload ends the walk cleanly
    trunc = synth_flac(3, 3)[:20]
    got = parse_flac_blocks(trunc)
    assert got is None or len(got) <= 1
    # extended-UTF-8 round trip incl. multi-byte frame numbers
    for v in (0, 1, 127, 128, 2047, 2048, 65535, 1 << 20, (1 << 36) - 1):
        enc = _utf8_code(v)
        assert _utf8_decode(enc, 0) == (v, len(enc)), v
    assert _utf8_decode(b"\x80", 0) is None  # bare continuation byte
    # published check values for the FLAC polynomials
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8  # CRC-16/BUYPASS (0x8005, init 0)


def test_flac_stages_no_shuffle(spark):
    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    fixture = with_synth_flac(docs)
    out = flac_frame_index(fixture)
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for d in range(24):
        want, _ = _flac_frames_expected(d, 3 + d % 6)
        got = [
            (r.frame_idx, r.offset, r.frame_len, r.blocksize,
             r.sample_rate, r.channels, r.frame_number)
            for r in sorted(by_doc[d], key=lambda r: r.frame_idx)
        ]
        assert got == want, d
    blocks = flac_block_index(fixture)
    assert blocks.count() == 48  # 2 blocks per doc
    for df in (out, blocks):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# EXIF
# ---------------------------------------------------------------------------


def _exif_expected(doc_id: int):
    return [
        (0, 0x010F, 2, 5, f"CAM{doc_id % 10}"),
        (0, 0x0110, 2, 4, f"M{doc_id % 100:02d}"),
        (0, 0x0112, 3, 1, str(1 + doc_id % 8)),
        (0, 0x011A, 5, 1, f"{72 + doc_id % 4}/1"),
        (1, 0x8827, 3, 1, str(100 * (1 + doc_id % 8))),
        (1, 0x829A, 5, 1, f"1/{30 + doc_id % 200}"),
    ]


def test_exif_parity_both_byte_orders():
    for doc_id in range(48):  # even = II, odd = MM
        assert parse_exif(synth_jpeg_exif(doc_id)) == _exif_expected(doc_id)


def test_exif_refusals_and_bounds():
    assert parse_exif(b"") is None
    assert parse_exif(b"nope") is None
    assert parse_exif(b"\xff\xd8\xff\xd9") is None  # no APP1
    data = synth_jpeg_exif(4)
    assert parse_exif(data[:30]) is None  # truncated inside TIFF
    # crafted entry count must not allocate/walk past the payload
    bad = bytearray(data)
    tiff0 = data.find(b"II") + 8  # IFD0 entry-count position
    bad[tiff0 : tiff0 + 2] = (60000).to_bytes(2, "little")
    assert parse_exif(bytes(bad)) is None
    # an out-of-bounds value offset skips the entry, not the file
    bad = bytearray(data)
    # Make's value offset lives at IFD0 entry 0 value slot
    val_slot = tiff0 + 2 + 8
    bad[val_slot : val_slot + 4] = (99999).to_bytes(4, "little")
    got = parse_exif(bytes(bad))
    assert got is not None and all(r[1] != 0x010F for r in got)


def test_exif_stage_no_shuffle(spark):
    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    out = exif_index(with_synth_exif(docs))
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for d in range(24):
        got = [
            (r.ifd, r.tag, r.dtype, r.n, r.value_s)
            for r in sorted(by_doc[d], key=lambda r: (r.ifd, r.tag))
        ]
        assert got == sorted(_exif_expected(d)), d
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# WebVTT
# ---------------------------------------------------------------------------


def _vtt_expected(doc_id: int, n: int):
    rows = []
    for i in range(n):
        start = (doc_id % 5) * 1800000 + i * 2000 + (doc_id % 7) * 111
        end = start + 900 + (doc_id * 13 + i * 29) % 2000
        nl = 1 + (doc_id + i) % 2
        text = "\n".join(f"line{j} doc{doc_id} cue{i}" for j in range(nl))
        rows.append(
            (i, start, end, f"c{doc_id}-{i}" if i % 2 == 0 else None, text, nl)
        )
    return rows


def test_webvtt_parity_sweep():
    for doc_id in range(48):
        n = 3 + doc_id % 5
        assert parse_webvtt(synth_webvtt(doc_id, n)) == _vtt_expected(doc_id, n)


def test_webvtt_edges():
    assert parse_webvtt(None) is None
    assert parse_webvtt("not vtt") is None
    assert parse_webvtt("WEBVTT\n\nNOTE only\n") is None
    # BOM + settings + hour-form timestamps + CRLF
    doc = "﻿WEBVTT\r\n\r\n01:00:01.000 --> 01:00:02.500 align:end\r\nhi\r\n"
    assert parse_webvtt(doc) == [(0, 3601000, 3602500, None, "hi", 1)]
    # a cue whose end precedes its start is skipped, not fatal
    doc = (
        "WEBVTT\n\n00:02.000 --> 00:01.000\nrewind\n\n"
        "ok\n00:03.000 --> 00:04.000\nfine\n"
    )
    assert parse_webvtt(doc) == [(0, 3000, 4000, "ok", "fine", 1)]


def test_webvtt_stage_no_shuffle(spark):
    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    out = webvtt_cue_index(with_synth_webvtt(docs))
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for d in range(24):
        got = [
            (r.cue_idx, r.start_ms, r.end_ms, r.cue_id, r.text, r.n_lines)
            for r in sorted(by_doc[d], key=lambda r: r.cue_idx)
        ]
        assert got == _vtt_expected(d, 3 + d % 5), d
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
