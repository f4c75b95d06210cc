"""VP9 superframe index (operators/vp9.py) and ADTS AAC frame index
(operators/audio.py): Annex-B trailing-index decode with 1- and
2-byte sizes, single-frame fallback, uncompressed-header bits, ADTS
CRC-variant headers, ID3v2 skip, truncation/garbage refusals, and the
Spark stage contracts (no shuffle, formula parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_scraper_spark.operators.audio import (
    adts_frame_index,
    adts_frames,
    synth_adts,
    synth_adts_payload_len,
    with_synth_adts,
)
from web_scraper_spark.operators.vp9 import (
    parse_vp9_frames,
    synth_vp9,
    synth_vp9_frame_len,
    vp9_frame_index,
    with_synth_vp9,
)

# ---------------------------------------------------------------------------
# VP9
# ---------------------------------------------------------------------------


def _vp9_expected(doc_id: int, n: int):
    rows, off = [], 0
    for i in range(n):
        flen = synth_vp9_frame_len(doc_id, i)
        key = i % 4 == 0
        rows.append((i, off, flen, 0, 0, 0 if key else 1, 1, 1 if key else 0))
        off += flen
    return rows, off


def _vp9_tuples(frames):
    return [
        (
            f["frame_idx"],
            f["offset"],
            f["frame_len"],
            f["profile"],
            f["show_existing"],
            f["frame_type"],
            f["show_frame"],
            f["is_keyframe"],
        )
        for f in frames
    ]


def test_vp9_superframe_parity_sweep():
    for doc_id in range(32):
        n = 4 + doc_id % 5
        data = synth_vp9(doc_id, n)
        want, frames_len = _vp9_expected(doc_id, n)
        mag = 1 + doc_id % 2
        assert frames_len + 2 + mag * n == len(data)  # extents tile
        assert _vp9_tuples(parse_vp9_frames(data)) == want, doc_id


def test_vp9_single_frame_and_fallbacks():
    # no index: one frame spanning the payload, header bits parsed
    single = bytes([0x82]) + b"\x01\x02\x03"
    got = parse_vp9_frames(single)
    assert _vp9_tuples(got) == [(0, 0, 4, 0, 0, 0, 1, 1)]
    # corrupted leading index marker -> single-frame fallback
    data = synth_vp9(2, 4)
    corrupt = bytearray(data)
    corrupt[-(2 + 1 * 4)] ^= 0xFF
    got = parse_vp9_frames(bytes(corrupt))
    assert len(got) == 1 and got[0]["frame_len"] == len(data)
    # index whose sizes don't fill the payload -> fallback
    bad = bytes([0x82, 0x01, 0xC8, 0x05, 0xC8])
    got = parse_vp9_frames(bad)
    assert len(got) == 1 and got[0]["frame_len"] == len(bad)
    # garbage (bad frame_marker) and empty -> None
    assert parse_vp9_frames(b"\x00\x11\x22") is None
    assert parse_vp9_frames(b"") is None


def test_vp9_header_bit_variants():
    from web_scraper_spark.operators.vp9 import _header_bits

    # show_existing_frame: no frame_type in the header
    assert _header_bits(bytes([0b10001000])) == (0, 1, None, None)
    # profile 3 inserts a reserved bit before show_existing
    assert _header_bits(bytes([0b10110010])) == (3, 0, 1, 0)
    # wrong frame_marker
    assert _header_bits(bytes([0b01000000])) is None


def test_vp9_stage_matches_formulas_no_shuffle(spark):
    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    out = vp9_frame_index(with_synth_vp9(docs))
    rows = out.collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == 24
    for d in range(24):
        want, _ = _vp9_expected(d, 4 + d % 5)
        got = [
            (
                r.frame_idx,
                r.offset,
                r.frame_len,
                r.profile,
                r.show_existing,
                r.frame_type,
                r.show_frame,
                r.is_keyframe,
            )
            for r in sorted(by_doc[d], key=lambda r: r.frame_idx)
        ]
        assert got == want, d
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# ADTS AAC
# ---------------------------------------------------------------------------


def _adts_expected(doc_id: int, n: int):
    rows, off = [], 10 + doc_id % 7
    for i in range(n):
        crc = 1 if i % 5 == 0 else 0
        flen = 7 + 2 * crc + synth_adts_payload_len(doc_id, i)
        rows.append(
            (
                i,
                off,
                flen,
                (doc_id + i) % 4,
                (48000, 44100, 32000)[i % 3],
                1 + (doc_id + i) % 2,
                crc,
                1,
            )
        )
        off += flen
    return rows, off


def test_adts_parity_sweep():
    for doc_id in range(32):
        n = 4 + doc_id % 6
        data = synth_adts(doc_id, n)
        want, total = _adts_expected(doc_id, n)
        assert total == len(data)  # extents tile the whole stream
        assert adts_frames(data) == want, doc_id


def test_adts_truncation_junk_and_refusals():
    data = synth_adts(3, 6)
    # truncated final frame dropped, complete prefix kept
    assert adts_frames(data[:-5]) == adts_frames(data)[:-1]
    # leading junk before raw frames: bounded resync finds frame 0
    prefix = 10 + 1 % 7
    junk = b"\x12\x34\x56" + synth_adts(1, 4)[prefix:]
    got = adts_frames(junk)
    assert got is not None and got[0][1] == 3
    # all-junk payloads -> None (within and beyond the resync bound)
    assert adts_frames(b"\x00" * 50) is None
    assert adts_frames(b"\x00" * 9000) is None
    # header whose aac_frame_length is smaller than the header -> None
    assert adts_frames(bytes([0xFF, 0xF1, 0x4C, 0x00, 0x00, 0x20, 0xFC])) is None
    # reserved sampling_frequency_index -> refused
    bad_sf = bytes([0xFF, 0xF1, 0x40 | (13 << 2), 0x00, 0x05, 0x20, 0xFC])
    assert adts_frames(bad_sf) is None


def test_adts_stage_matches_formulas_no_shuffle(spark):
    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    out = adts_frame_index(with_synth_adts(docs))
    rows = out.collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == 24
    for d in range(24):
        want, _ = _adts_expected(d, 4 + d % 6)
        got = [
            (
                r.frame_idx,
                r.offset,
                r.frame_len,
                r.profile,
                r.sample_rate,
                r.channels,
                r.crc_present,
                r.n_blocks,
            )
            for r in sorted(by_doc[d], key=lambda r: r.frame_idx)
        ]
        assert got == want, d
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
