"""Codec-free real decode (operators/rawmedia.py): BMP pixel recovery
(padding, vertical flip, 24/32-bit), PNG full decode (zlib inflate +
all five spec §9 filters, CRC verification, truncation), and GIF
frame-structure walking (extensions, color tables, truncation), plus
the Spark stages."""

from __future__ import annotations

import struct
import zlib

import numpy as np
from pyspark.sql import functions as F

from web_scraper_spark.operators.rawmedia import (
    _MULT,
    _STRIDE,
    decode_bmp_features,
    decode_bmp_pixels,
    decode_png_features,
    decode_png_pixels,
    gif_frame_index,
    gif_frames,
    parse_bmp,
    parse_png,
    synth_bmp,
    synth_gif,
    synth_png,
    with_synth_bmp,
    with_synth_gif,
    with_synth_png,
)


def test_bmp_roundtrip_geometry():
    for doc_id, w, h, bpp in [(0, 16, 8, 24), (5, 21, 13, 32), (9, 17, 9, 24)]:
        bmp = synth_bmp(doc_id, w, h, bpp)
        assert parse_bmp(bmp)[:3] == (w, h, bpp)
        px = decode_bmp_pixels(bmp)
        assert px.shape == (h, w, bpp // 8)


def test_bmp_bottom_up_flip_and_padding():
    """A hand-built 2x2 24-bit BMP: stored rows are bottom-up and
    3-byte-per-pixel rows pad to 4-byte boundaries — the decoder must
    undo both."""
    # display rows: top = [blue, green], bottom = [red, white] (BGR)
    top = bytes([255, 0, 0, 0, 255, 0])
    bot = bytes([0, 0, 255, 255, 255, 255])
    stride = 8  # 2*3 -> padded to 8
    pixels = bot + b"\x00\x00" + top + b"\x00\x00"  # stored bottom-up
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixels), 0, 0, 0, 0)
    off = 54
    data = b"BM" + struct.pack("<IHHI", off + len(pixels), 0, 0, off) + info + pixels
    px = decode_bmp_pixels(data)
    assert px[0, 0].tolist() == [255, 0, 0]  # top-left is blue again
    assert px[1, 1].tolist() == [255, 255, 255]
    # top-down variant (negative height): rows stay in file order
    info_td = struct.pack(
        "<IiiHHIIiiII", 40, 2, -2, 1, 24, 0, len(pixels), 0, 0, 0, 0
    )
    data_td = (
        b"BM" + struct.pack("<IHHI", off + len(pixels), 0, 0, off) + info_td + pixels
    )
    assert decode_bmp_pixels(data_td)[0, 0].tolist() == [0, 0, 255]


def test_bmp_rejects_what_it_cannot_decode():
    assert parse_bmp(b"") is None
    assert parse_bmp(b"BM" + b"\x00" * 60) is None  # zero dims
    good = synth_bmp(1, 16, 8, 24)
    # RLE compression flag -> honest refusal, not garbage pixels
    bad = bytearray(good)
    bad[30] = 1
    assert parse_bmp(bytes(bad)) is None
    # truncated pixel array
    assert parse_bmp(good[:-10]) is None


def test_bmp_feature_means_match_numpy(spark):
    docs = spark.range(0, 6).select(F.col("id").alias("doc_id"))
    rows = {r.doc_id: r for r in decode_bmp_features(with_synth_bmp(docs)).collect()}
    for d in range(6):
        w, h, bpp = 16 + d % 17, 8 + d % 13, 24 + 8 * (d % 2)
        px = decode_bmp_pixels(synth_bmp(d, w, h, bpp)).astype(np.int64)
        r = rows[d]
        assert (r.width, r.height, r.bpp) == (w, h, bpp)
        assert r.mean_b == int(px[:, :, 0].sum()) / (w * h)
        assert r.mean_r == int(px[:, :, 2].sum()) / (w * h)
        assert (r.mean_a is None) == (bpp == 24)


_REAL_GIF = (  # canonical 1x1 transparent GIF89a, global color table
    b"GIF89a\x01\x00\x01\x00\x80\x00\x00\x00\x00\x00\xff\xff\xff"
    b"\x21\xf9\x04\x01\x00\x00\x00\x00"
    b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02\x44\x01\x00\x3b"
)


def test_gif_walk_real_file_and_synth():
    assert gif_frames(_REAL_GIF) == [(0, 0, 0, 1, 1, 0)]
    fr = gif_frames(synth_gif(7, 4))
    assert len(fr) == 4
    for f, (idx, x, y, w, h, delay) in enumerate(fr):
        assert idx == f
        assert (x, y) == (f % 5, (f * 2) % 5)
        assert w == 4 + (7 + f) % 9 and h == 3 + (7 * 3 + f) % 7
        assert delay == 3 + (7 * 7 + f) % 12


def test_gif_skips_extensions_and_local_tables():
    g = bytearray(b"GIF89a" + struct.pack("<HH", 9, 9) + bytes([0, 0, 0]))
    # comment extension with two sub-blocks
    g += b"\x21\xfe" + bytes([3]) + b"abc" + bytes([2]) + b"xy" + b"\x00"
    # image with a LOCAL color table (packed 0x81 -> 4 entries)
    g += b"\x2c" + struct.pack("<HHHH", 1, 2, 3, 4) + bytes([0x81])
    g += bytes(12)  # local color table 4*3
    g += bytes([3, 1, 0xAA, 0x00])  # lzw min, 1-byte sub-block, term
    g += b"\x3b"
    assert gif_frames(bytes(g)) == [(0, 1, 2, 3, 4, 0)]


def test_gif_truncation_and_garbage():
    assert gif_frames(b"") is None
    assert gif_frames(b"\x89PNG" + bytes(20)) is None
    full = synth_gif(3, 3)
    # cut mid-frame: keep the complete frames seen so far
    fr = gif_frames(full[: len(full) - 8])
    assert fr is not None and 1 <= len(fr) <= 3


def test_gif_stage_rows_and_no_shuffle(spark):
    docs = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    out = gif_frame_index(with_synth_gif(docs))
    per = {r.doc_id: r["n"] for r in out.groupBy("doc_id").agg(
        F.count("*").alias("n")).collect()}
    assert per == {d: 1 + d % 5 for d in range(10)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1  # only the groupBy test agg
    plan2 = (
        decode_bmp_features(with_synth_bmp(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan2


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def test_png_roundtrip_all_filters_and_color_types():
    # geometry sweep covers grey/grey+A/RGB/RGBA and, with h >= 5 and
    # filter type = (id + row) % 5, every spec filter in every image
    for doc_id in range(40):
        w, h, ch = 9 + doc_id % 14, 5 + doc_id % 11, 1 + doc_id % 4
        px = decode_png_pixels(synth_png(doc_id, w, h, ch))
        assert px is not None and px.shape == (h, w, ch)
        j = np.arange(h * w * ch, dtype=np.int64)
        want = ((doc_id * _MULT + j * _STRIDE) % 256).astype(np.uint8)
        assert np.array_equal(px, want.reshape(h, w, ch)), doc_id


def test_png_parse_validates_structure():
    d = synth_png(3, 10, 6, 3)
    hdr = parse_png(d)
    assert hdr is not None and hdr[:2] == (10, 6) and hdr[4] == 3
    # two IDAT chunks really are emitted and concatenated
    assert d.count(b"IDAT") == 2
    assert parse_png(b"") is None
    assert parse_png(b"\x89PNG\r\n\x1a\n" + bytes(30)) is None
    # CRC corruption anywhere -> reject
    corrupt = bytearray(d)
    corrupt[40] ^= 0xFF
    assert parse_png(bytes(corrupt)) is None
    # interlaced / 16-bit / palette IHDRs are honestly refused
    for patch in ((28, 1), (24, 16), (25, 3)):  # interlace, depth, color
        b = bytearray(d)
        b[patch[0]] = patch[1]
        body = bytes(b[16:29])
        b[29:33] = struct.pack(">I", zlib.crc32(b"IHDR" + body))
        assert parse_png(bytes(b)) is None


def test_png_truncation_semantics():
    d = synth_png(7, 12, 8, 4)
    # trailer-tolerant: complete IDAT decodes without IEND
    assert decode_png_pixels(d[:-7]) is not None
    # truncation inside a chunk -> None (CRC can't verify)
    assert decode_png_pixels(d[:60]) is None
    # inflate error: valid chunk framing around garbage IDAT
    from web_scraper_spark.operators.rawmedia import _PNG_SIG, _png_chunk
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    bad = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", b"\x00not-zlib")
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png_pixels(bad) is None


def test_png_stage_features_match_numpy(spark):
    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    out = decode_png_features(with_synth_png(docs))
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 24
    for d in range(24):
        w, h, ch = 9 + d % 14, 5 + d % 11, 1 + d % 4
        px = decode_png_pixels(synth_png(d, w, h, ch))
        r = rows[d]
        assert (r.width, r.height, r.channels) == (w, h, ch)
        for k in range(4):
            got = getattr(r, f"mean_c{k}")
            if k < ch:
                want = px[:, :, k].astype(np.int64).sum() / (w * h)
                assert got == want  # integer-exact, no float drift
            else:
                assert got is None
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# GIF full pixel decode (real LZW)
# ---------------------------------------------------------------------------


def test_lzw_roundtrip_growth_and_reset():
    from web_scraper_spark.operators.rawmedia import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(11)
    for mcs in (2, 4, 8):
        streams = [
            [0] * 5000,                                   # max repetition
            list(rng.integers(0, 1 << mcs, 20000)),       # forces table reset
            list(range(1 << mcs)) * 40,                   # cycling alphabet
            [],                                            # empty image data
        ]
        for s in streams:
            enc = _lzw_encode(s, mcs)
            assert _lzw_decode(enc, mcs) == [int(x) for x in s]
    # truncated stream: decode keeps the prefix, never crashes
    full = _lzw_encode(list(range(16)) * 30, 4)
    part = _lzw_decode(full[: len(full) // 2], 4)
    assert part is not None and len(part) < 480
    # garbage codes -> honest None (first code out of range)
    assert _lzw_decode(b"\xff\xff\xff", 2) is None


def test_gif_pixel_decode_real_file_and_synth():
    from web_scraper_spark.operators.rawmedia import (
        _MULT,
        _STRIDE,
        gif_decode_pixels,
        synth_gif_pixels,
    )

    # canonical 1x1 GIF89a with third-party LZW bytes -> one black pixel
    px = gif_decode_pixels(_REAL_GIF)
    assert px is not None and px.shape == (1, 1, 3)
    assert px.tolist() == [[[0, 0, 0]]]
    # synth round-trip: even ids sequential, odd ids interlaced
    for d in (0, 1, 2, 3, 12, 13):
        w, h = 9 + d % 14, 5 + d % 11
        px = gif_decode_pixels(synth_gif_pixels(d, w, h))
        assert px is not None and px.shape == (h, w, 3)
        j = np.arange(h * w, dtype=np.int64)
        idx = ((d * _MULT + j * _STRIDE) % 256).reshape(h, w)
        want = np.stack(
            [(idx * 7 + 3) % 256, (idx * 11 + 5) % 256, (idx * 13 + 9) % 256],
            axis=2,
        ).astype(np.uint8)
        assert np.array_equal(px, want), d


def test_gif_pixel_decode_refusals():
    from web_scraper_spark.operators.rawmedia import (
        gif_decode_pixels,
        synth_gif_pixels,
    )

    assert gif_decode_pixels(b"") is None
    # frame index past the end
    assert gif_decode_pixels(synth_gif_pixels(2, 6, 4), frame=1) is None
    # structural synth_gif (filler sub-blocks, no color table) is not
    # pixel-decodable: refuse rather than emit garbage
    assert gif_decode_pixels(synth_gif(5, 2)) is None
    # truncation inside the pixel data -> short index stream -> None
    full = synth_gif_pixels(4, 12, 9)
    assert gif_decode_pixels(full[: len(full) - 30]) is None


def test_gif_pixel_stage_matches_local(spark):
    from web_scraper_spark.operators.rawmedia import (
        decode_gif_features,
        gif_decode_pixels,
        synth_gif_pixels,
        with_synth_gif_pixels,
    )

    docs = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    out = decode_gif_features(with_synth_gif_pixels(docs))
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 12
    for d in range(12):
        w, h = 9 + d % 14, 5 + d % 11
        px = gif_decode_pixels(synth_gif_pixels(d, w, h)).astype(np.int64)
        r = rows[d]
        assert (r.width, r.height) == (w, h)
        assert r.mean_r == int(px[:, :, 0].sum()) / (w * h)
        assert r.mean_b == int(px[:, :, 2].sum()) / (w * h)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
