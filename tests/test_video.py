"""ISO BMFF container walk (operators/video.py): box parsing incl.
64-bit largesize, sample-table resolution (stsc x stsz x stco),
keyframe marks, moov-only tolerance, honest refusals."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from web_scraper_spark.operators.video import (
    _box,
    mp4_frame_index,
    mp4_sample_offsets,
    mp4_track_index,
    parse_mp4,
    synth_chunk_offset,
    synth_mp4,
    synth_sample_size,
    with_synth_mp4,
)


def test_track_metadata_roundtrip():
    for d in range(14):
        n = 5 + d % 9
        tracks = parse_mp4(synth_mp4(d, n))
        assert tracks is not None and len(tracks) == 1
        t = tracks[0]
        assert t["handler"] == "vide" and t["codec"] == "fk01"
        assert t["track_id"] == 1
        assert (t["width"], t["height"]) == (16 * (1 + d % 5), 16 * (1 + d % 3))
        assert t["timescale"] == 1000 + (d % 7) * 100
        assert t["duration"] == n * (t["timescale"] // 10)
        assert len(t["sizes"]) == n
        assert t["sync"] == set(range(0, n, 4))


def test_sample_offsets_resolve_stsc_runs():
    """A sample's offset = its chunk's stco offset + sizes of earlier
    samples in that chunk; chunks hold 3 samples (last ragged)."""
    for d in (0, 5, 10):
        n = 5 + d % 9
        t = parse_mp4(synth_mp4(d, n))[0]
        offs = mp4_sample_offsets(t)
        assert len(offs) == n
        for i, (off, size) in enumerate(offs):
            c, w = i // 3, i % 3
            want = synth_chunk_offset(d, c) + sum(
                synth_sample_size(d, 3 * c + k) for k in range(w)
            )
            assert (off, size) == (want, synth_sample_size(d, i))


def test_largesize_and_free_boxes_and_refusals():
    base = synth_mp4(2, 6)
    # insert a free box between ftyp and moov: still parses
    ftyp_len = struct.unpack(">I", base[:4])[0]
    patched = base[:ftyp_len] + _box(b"free", b"junk") + base[ftyp_len:]
    assert parse_mp4(patched) is not None
    # wrap moov in a 64-bit largesize header: still parses
    moov = base[ftyp_len:]
    big = base[:ftyp_len] + (
        struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(moov) - 8) + moov[8:]
    )
    assert parse_mp4(big) is not None
    # refusals: empty, non-BMFF, truncated moov
    assert parse_mp4(b"") is None
    assert parse_mp4(b"\x00\x00\x00\x08free") is None
    assert parse_mp4(base[:40]) is None
    # box claiming to extend past the payload stops the walk cleanly
    bad = bytearray(base)
    bad[ftyp_len : ftyp_len + 4] = struct.pack(">I", 1 << 30)
    assert parse_mp4(bytes(bad)) is None


def test_spark_stages_match_formulas(spark):
    docs = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    tracks = {r.doc_id: r for r in mp4_track_index(with_synth_mp4(docs)).collect()}
    assert len(tracks) == 12
    for d in range(12):
        r = tracks[d]
        assert (r.width, r.height) == (16 * (1 + d % 5), 16 * (1 + d % 3))
        assert r.n_samples == 5 + d % 9
        assert r.n_keyframes == (r.n_samples + 3) // 4
    frames = mp4_frame_index(with_synth_mp4(docs)).collect()
    assert len(frames) == sum(5 + d % 9 for d in range(12))
    kf = mp4_frame_index(with_synth_mp4(docs), keyframes_only=True).collect()
    assert all(r.is_keyframe == 1 and r.frame_idx % 4 == 0 for r in kf)
    assert len(kf) == sum((5 + d % 9 + 3) // 4 for d in range(12))
    out = mp4_frame_index(with_synth_mp4(docs))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
