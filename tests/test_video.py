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


# ---------------------------------------------------------------------------
# WebM / EBML
# ---------------------------------------------------------------------------


def test_webm_walk_tracks_and_frames():
    from web_scraper_spark.operators.video import (
        parse_webm,
        synth_webm,
        synth_webm_frame_len,
    )

    for d in range(14):
        n = 5 + d % 9
        p = parse_webm(synth_webm(d, n))
        assert p is not None and p["timescale_ns"] == 1_000_000
        assert p["tracks"] == [(1, 1, "V_FK0", 16 * (1 + d % 5), 16 * (1 + d % 3))]
        assert len(p["frames"]) == n
        cum = 0
        for i, (trk, ts, off, ln, kf) in enumerate(p["frames"]):
            c, k = i // 4, i % 4
            assert trk == 1 and ts == c * 200 + k * 50
            assert off == 102 + 16 * (c + 1) + 13 * (i + 1) + cum
            assert ln == synth_webm_frame_len(d, i)
            assert kf == (1 if k == 0 else 0)
            cum += ln


def test_webm_variable_width_vints_and_refusals():
    from web_scraper_spark.operators.video import parse_webm, synth_webm

    base = synth_webm(3, 6)
    # a hand-built file with 1-byte (short-form) size fields must also
    # parse: the decoder reads real varints, not the synth's fixed form
    hdr = b"\x1a\x45\xdf\xa3" + bytes([0x80 | 7]) + b"\x42\x82\x84webm"
    info = b"\x15\x49\xa9\x66" + bytes([0x80 | 8]) + b"\x2a\xd7\xb1\x84" + (250000).to_bytes(4, "big")
    video = b"\xe0" + bytes([0x80 | 8]) + b"\xb0\x82\x00\x20\xba\x82\x00\x10"
    entry = b"\xae" + bytes([0x80 | (3 + 3 + 7 + len(video))]) + (
        b"\xd7\x81\x02" + b"\x83\x81\x01" + b"\x86\x85V_XY9" + video
    )
    tracks = b"\x16\x54\xae\x6b" + bytes([0x80 | len(entry)]) + entry
    block = b"\x82" + b"\x00\x0a" + b"\x80" + b"abc"  # track 2, rel 10, key
    cluster_body = b"\xe7\x81\x05" + b"\xa3" + bytes([0x80 | len(block)]) + block
    cluster = b"\x1f\x43\xb6\x75" + bytes([0x80 | len(cluster_body)]) + cluster_body
    seg_body = info + tracks + cluster
    seg = b"\x18\x53\x80\x67" + bytes([0x80 | len(seg_body)]) + seg_body
    p = parse_webm(hdr + seg)
    assert p is not None
    assert p["timescale_ns"] == 250000
    assert p["tracks"] == [(2, 1, "V_XY9", 32, 16)]
    assert p["frames"] == [(2, 15, len(hdr + seg) - 3, 3, 1)]
    # refusals
    assert parse_webm(b"") is None
    assert parse_webm(b"\x00" * 64) is None
    assert parse_webm(base[:8]) is None


def test_webm_stage_matches_formulas(spark):
    from web_scraper_spark.operators.video import webm_frame_index, with_synth_webm

    docs = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    out = webm_frame_index(with_synth_webm(docs))
    rows = out.collect()
    assert len(rows) == sum(5 + d % 9 for d in range(10))
    assert all(r.track == 1 for r in rows)
    kf = [r for r in rows if r.is_keyframe == 1]
    assert all(r.frame_idx % 4 == 0 for r in kf)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
