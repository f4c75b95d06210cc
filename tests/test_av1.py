"""AV1 OBU index (operators/av1.py): low-overhead bitstream walk with
leb128 sizes (1- and 2-byte, load-bearing for offsets), extension-
header temporal/spatial ids, frame-header bits incl. the sequence
header's reduced_still_picture_header shortcut, truncation/garbage
refusals, and the Spark stage contract (no shuffle, formula parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_scraper_spark.operators.av1 import (
    FRAME_KEY,
    OBU_FRAME,
    OBU_FRAME_HEADER,
    OBU_SEQUENCE_HEADER,
    av1_obu_index,
    leb128_encode,
    parse_obus,
    synth_av1,
    synth_av1_filler_len,
    with_synth_av1,
)


def _expected(doc_id: int, n: int):
    """(obu_idx, offset, obu_len, header_len, obu_type, has_extension,
    temporal_id, spatial_id, obu_size, show_existing, frame_type,
    show_frame, is_keyframe) rows + total wire length."""
    rows = [
        (0, 0, 2, 2, 2, 0, 0, 0, 0, None, None, None, 0),
        (1, 2, 8, 2, 1, 0, 0, 0, 6, None, None, None, 0),
        (2, 10, 6, 2, 5, 0, 0, 0, 4, None, None, None, 0),
    ]
    off = 16
    for i in range(n):
        key = i % 4 == 0
        payload = 1 + synth_av1_filler_len(doc_id, i)
        ext = 0 if key else 1
        leb = 2 if payload > 127 else 1
        hlen = 1 + ext + leb
        rows.append(
            (
                3 + i,
                off,
                hlen + payload,
                hlen,
                6,
                ext,
                0 if key else i % 3,
                0,
                payload,
                0,
                0 if key else 1,
                1,
                1 if key else 0,
            )
        )
        off += hlen + payload
    return rows, off


def _tuples(obus):
    return [
        (
            k,
            o["offset"],
            o["obu_len"],
            o["header_len"],
            o["obu_type"],
            o["has_extension"],
            o["temporal_id"],
            o["spatial_id"],
            o["obu_size"],
            o["show_existing"],
            o["frame_type"],
            o["show_frame"],
            o["is_keyframe"],
        )
        for k, o in enumerate(obus)
    ]


def test_synth_parse_parity_sweep():
    for doc_id in range(32):
        n = 4 + doc_id % 8
        data = synth_av1(doc_id, n)
        want, total = _expected(doc_id, n)
        assert total == len(data)  # extents tile the whole stream
        assert _tuples(parse_obus(data)) == want, doc_id


def test_multibyte_leb128_is_load_bearing():
    # every i%4==2 frame's payload exceeds 127 bytes -> 2-byte size
    # field; the offsets of every later OBU depend on reading it right
    data = synth_av1(7, 8)
    obus = parse_obus(data)
    big = [o for o in obus if o["obu_size"] > 127]
    assert big and all(
        o["header_len"] == 1 + o["has_extension"] + 2 for o in big
    )
    assert obus[-1]["offset"] + obus[-1]["obu_len"] == len(data)


def test_truncation_and_garbage_refusals():
    data = synth_av1(3, 6)
    whole = parse_obus(data)
    # cut mid final payload: the truncated OBU is dropped, prior kept
    cut = parse_obus(data[:-5])
    assert _tuples(cut) == _tuples(whole)[:-1]
    # cut inside a 2-byte leb128 size field
    third_frame_hdr = whole[5]["offset"]
    assert parse_obus(data[: third_frame_hdr + 2]) is not None
    # forbidden bit / reserved bit / reserved type / empty -> None
    assert parse_obus(b"\x80\x00" + data) is None
    assert parse_obus(b"\x13\x00") is None
    assert parse_obus(b"\x02\x00") is None
    assert parse_obus(b"") is None
    # 9-byte leb128 ends the walk
    assert parse_obus(bytes([OBU_FRAME << 3 | 0x02]) + b"\x80" * 9) is None


def test_sizeless_final_obu_extends_to_end():
    stream = bytes([OBU_FRAME << 3]) + bytes([0x1C]) + b"xyz"
    got = parse_obus(stream)
    assert len(got) == 1
    assert got[0]["obu_size"] == 4 and got[0]["obu_len"] == 5
    assert got[0]["is_keyframe"] == 1  # frame_type bits still parsed


def test_reduced_still_picture_and_show_existing():
    seq = bytes([0x08]) + b"\x41\x42"  # reduced_still_picture_header=1
    s = (
        bytes([(OBU_SEQUENCE_HEADER << 3) | 0x02])
        + leb128_encode(len(seq))
        + seq
        + bytes([(OBU_FRAME << 3) | 0x02])
        + leb128_encode(3)
        + b"\xff\x00\x01"  # all-ones first byte: must be ignored
    )
    got = parse_obus(s)
    assert got[1]["frame_type"] == FRAME_KEY
    assert got[1]["show_frame"] == 1 and got[1]["is_keyframe"] == 1
    # without the reduced shortcut, show_existing_frame=1 carries no
    # frame_type at all
    s2 = bytes([(OBU_FRAME_HEADER << 3) | 0x02]) + leb128_encode(1) + b"\x80"
    got = parse_obus(s2)
    assert got[0]["show_existing"] == 1
    assert got[0]["frame_type"] is None and got[0]["is_keyframe"] == 0


def test_stage_matches_formulas_no_shuffle(spark):
    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    out = av1_obu_index(with_synth_av1(docs))
    rows = out.collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == 24
    for d in range(24):
        want, _total = _expected(d, 4 + d % 8)
        got = [
            (
                r.obu_idx,
                r.offset,
                r.obu_len,
                r.header_len,
                r.obu_type,
                r.has_extension,
                r.temporal_id,
                r.spatial_id,
                r.obu_size,
                r.show_existing,
                r.frame_type,
                r.show_frame,
                r.is_keyframe,
            )
            for r in sorted(by_doc[d], key=lambda r: r.obu_idx)
        ]
        assert got == want, d
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
