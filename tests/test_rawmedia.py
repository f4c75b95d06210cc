"""Codec-free real decode (operators/rawmedia.py): BMP pixel recovery
(padding, vertical flip, 24/32-bit) and GIF frame-structure walking
(extensions, color tables, truncation), plus the Spark stages."""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import functions as F

from web_scraper_spark.operators.rawmedia import (
    decode_bmp_features,
    decode_bmp_pixels,
    gif_frame_index,
    gif_frames,
    parse_bmp,
    synth_bmp,
    synth_gif,
    with_synth_bmp,
    with_synth_gif,
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
