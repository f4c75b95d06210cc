"""Native-decoder seam (operators/native_codecs.py): the strict media
pipeline must accept ``decoder="native"`` and produce pixel-identical
results to the pure-Python decoders (JPEG: IDCT-rounding tolerance).

PIL is absent in this sandbox, so the pixel-equality tests are
skipif'd — they prove the swap-in seam works the moment a pillow wheel
exists (same pattern as the Iceberg-jar test). What always runs: the
driver-side ImportError contract and the decoder-arg validation, so
the seam itself can never rot silently.
"""

from __future__ import annotations

import numpy as np
import pytest

from web_scraper_spark.operators.native_codecs import have_native

HAVE_PIL = have_native()


def test_native_unavailable_fails_at_plan_build(spark):
    from web_scraper_spark.operators.multimodal import (
        decode_features,
        with_synth_mixed_media,
    )

    docs = with_synth_mixed_media(
        spark.range(0, 4).selectExpr("id as doc_id")
    )
    if HAVE_PIL:
        pytest.skip("PIL present: the error contract doesn't apply")
    # requesting the native decoder without PIL must raise HERE, on the
    # driver at plan-build time — never inside an executor mid-stage
    with pytest.raises(ImportError, match="pillow"):
        decode_features(docs, strict=True, decoder="native")
    with pytest.raises(ValueError, match="decoder"):
        decode_features(docs, decoder="turbo")


@pytest.mark.skipif(not HAVE_PIL, reason="pillow not installed in sandbox")
def test_native_matches_pure_pixels():
    from web_scraper_spark.operators.jpeg import decode_jpeg_pixels, synth_jpeg
    from web_scraper_spark.operators.native_codecs import native_pixel_decode
    from web_scraper_spark.operators.rawmedia import (
        decode_bmp_pixels,
        decode_png_pixels,
        gif_decode_pixels,
        synth_bmp,
        synth_gif_pixels,
        synth_png,
    )

    for doc_id in range(24):
        # lossless formats: byte-identical arrays
        png = synth_png(doc_id, 9 + doc_id % 14, 5 + doc_id % 11, 1 + doc_id % 4)
        assert np.array_equal(native_pixel_decode(png), decode_png_pixels(png))
        gif = synth_gif_pixels(doc_id, 8 + doc_id % 9, 6 + doc_id % 7)
        assert np.array_equal(native_pixel_decode(gif), gif_decode_pixels(gif))
        bmp = synth_bmp(doc_id, 7 + doc_id % 9, 5 + doc_id % 6)
        assert np.array_equal(native_pixel_decode(bmp), decode_bmp_pixels(bmp))
        # JPEG: bit-exact coefficients, but the spec permits IDCT
        # rounding differences between decoders
        jpg = synth_jpeg(doc_id, 1 + doc_id % 4, 1 + doc_id % 3)
        ours = decode_jpeg_pixels(jpg)
        theirs = native_pixel_decode(jpg)
        assert theirs.shape == ours.shape
        assert np.abs(theirs.astype(int) - ours.astype(int)).max() <= 2


@pytest.mark.skipif(not HAVE_PIL, reason="pillow not installed in sandbox")
def test_native_stage_matches_pure_stage(spark):
    from web_scraper_spark.operators.multimodal import (
        decode_features,
        with_synth_mixed_media,
    )

    docs = with_synth_mixed_media(
        spark.range(0, 32).selectExpr("id as doc_id")
    )
    pure = {
        r.doc_id: r
        for r in decode_features(docs, strict=True).collect()
    }
    native = {
        r.doc_id: r
        for r in decode_features(docs, strict=True, decoder="native").collect()
    }
    assert set(pure) == set(native)
    for d, p in pure.items():
        n = native[d]
        assert (p.format, p.n_frames, p.n_bytes) == (n.format, n.n_frames, n.n_bytes)
        assert np.allclose(p.feature, n.feature, atol=0.01)
