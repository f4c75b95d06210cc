"""H.264 Annex-B NAL index (operators/h264.py): start-code scan with
3/4-byte prefixes and leading_zero_8bits, emulation-prevention escape
round-trips, exp-Golomb slice-header fields, truncation/garbage
refusals, and the Spark stage contract (no shuffle, formula parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_scraper_spark.operators.h264 import (
    escape_rbsp,
    h264_nal_index,
    parse_annexb,
    synth_h264,
    synth_filler_len,
    unescape_ebsp,
    with_synth_h264,
)


def _expected(doc_id: int, n: int):
    rows = [
        (0, 0, 4, 13, 7, 3, 0, None, None),
        (1, 13, 3, 8, 8, 3, 0, None, None),
    ]
    off = 21
    for i in range(n):
        idr = i % 4 == 0
        tot = (4 if idr else 3) + 2 + synth_filler_len(doc_id, i) + 5 * (i % 2)
        rows.append(
            (
                2 + i,
                off,
                4 if idr else 3,
                tot,
                5 if idr else 1,
                3 if idr else 2,
                1 if idr else 0,
                7 if idr else i % 2,
                0,
            )
        )
        off += tot
    return rows, off


def test_synth_parse_parity_sweep():
    for doc_id in range(32):
        n = 4 + doc_id % 8
        data = synth_h264(doc_id, n)
        want, total = _expected(doc_id, n)
        assert total == len(data)  # extents tile the whole stream
        nals = parse_annexb(data)
        got = [
            (
                k,
                r["offset"],
                r["start_code_len"],
                r["nal_len"],
                r["nal_type"],
                r["ref_idc"],
                r["is_idr"],
                r["slice_type"],
                r["first_mb"],
            )
            for k, r in enumerate(nals)
        ]
        assert got == want, doc_id


def test_emulation_prevention_is_load_bearing():
    # escape inserts 0x03 before every <=0x03 byte after a 00 00 run,
    # and the result never contains a start-code prefix
    rbsp = b"\x00\x00\x00\x00\x01\x00\x00\x02\x00\x00\x03ab\x00\x00\x01"
    ebsp = escape_rbsp(rbsp)
    assert b"\x00\x00\x01" not in ebsp
    assert b"\x00\x00\x00" not in ebsp
    assert unescape_ebsp(ebsp) == rbsp
    # odd synth slices embed a raw 0x000001 in the RBSP; without the
    # escape the scan would split the NAL — pin that the slice count
    # is exact and the would-be start code stayed inside one extent
    data = synth_h264(3, 8)
    nals = parse_annexb(data)
    assert len(nals) == 10
    # corrupt: strip the escape byte from the first odd slice (nal_idx
    # 3) -> the raw 0x000001 now reads as a NAL boundary, cutting that
    # slice's extent short (the bogus "NAL" has header 0x80, forbidden
    # bit set, so it is skipped rather than emitted)
    at = data.index(b"\x00\x00\x03\x01\x80")
    stripped = data[: at + 2] + data[at + 3 :]
    cut = parse_annexb(stripped)
    assert len(cut) == 10
    assert cut[3]["nal_len"] == nals[3]["nal_len"] - 5  # tail split off


def test_leading_zeros_and_refusals():
    data = synth_h264(5, 4)
    # extra leading_zero_8bits before the PPS prefix: extents stay
    # contiguous, the zeros fold into the PPS extent
    padded = data[:13] + b"\x00\x00" + data[13:]
    nals = parse_annexb(padded)
    assert nals[0]["nal_len"] == 13
    assert nals[1]["offset"] == 13 and nals[1]["start_code_len"] == 5
    assert nals[1]["nal_len"] == 10 and nals[1]["nal_type"] == 8
    assert [r["offset"] + r["nal_len"] for r in nals[:-1]] == [
        r["offset"] for r in nals[1:]
    ]
    # refusals: empty / no start code / start code at EOF
    assert parse_annexb(b"") is None
    assert parse_annexb(b"\x42" * 64) is None
    assert parse_annexb(b"\x00\x00\x01") == []
    # forbidden_zero_bit set -> that NAL is skipped, others survive
    bad = bytearray(data)
    bad[4] |= 0x80  # SPS header byte
    nals = parse_annexb(bytes(bad))
    assert [r["nal_type"] for r in nals][0] == 8  # PPS is now first
    # truncated slice header -> extent row still emitted, fields null
    cut = data[:23]  # slice 0 prefix + header + 1 byte of payload...
    nals = parse_annexb(data[: 21 + 5 + 1])
    assert nals[-1]["nal_type"] == 5 and nals[-1]["first_mb"] == 0


def test_truncated_slice_header_fields_null():
    # a slice NAL whose payload ends before slice_type completes:
    # header byte present, zero payload bytes
    data = b"\x00\x00\x01\x41"  # non-IDR slice, nothing after header
    nals = parse_annexb(data)
    assert len(nals) == 1
    assert nals[0]["nal_type"] == 1
    assert nals[0]["slice_type"] is None and nals[0]["first_mb"] is None


def test_stage_matches_formulas_no_shuffle(spark):
    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    out = h264_nal_index(with_synth_h264(docs))
    rows = out.collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == 24
    for d in range(24):
        want, _total = _expected(d, 4 + d % 8)
        got = [
            (
                r.nal_idx,
                r.offset,
                r.start_code_len,
                r.nal_len,
                r.nal_type,
                r.ref_idc,
                r.is_idr,
                r.slice_type,
                r.first_mb,
            )
            for r in sorted(by_doc[d], key=lambda r: r.nal_idx)
        ]
        assert got == want, d
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# HEVC (shares the Annex-B framing; 2-byte NAL header, temporal layers)
# ---------------------------------------------------------------------------


def _hevc_expected(doc_id: int, n: int):
    from web_scraper_spark.operators.h264 import synth_hevc_filler_len

    rows = [
        (0, 0, 4, 12, 32, 0, 0, 0, 0, None),
        (1, 12, 3, 10, 33, 0, 0, 0, 0, None),
        (2, 22, 3, 9, 34, 0, 0, 0, 0, None),
    ]
    off = 31
    for i in range(n):
        idr = i % 4 == 0
        tot = (4 if idr else 3) + 3 + synth_hevc_filler_len(doc_id, i) + 5 * (i % 2)
        rows.append(
            (
                3 + i,
                off,
                4 if idr else 3,
                tot,
                19 if idr else 1,
                0,
                0 if idr else i % 3,
                1 if idr else 0,
                1 if idr else 0,
                1,
            )
        )
        off += tot
    return rows, off


def test_hevc_parse_parity_sweep():
    from web_scraper_spark.operators.h264 import parse_annexb_hevc, synth_hevc

    for doc_id in range(32):
        n = 4 + doc_id % 8
        data = synth_hevc(doc_id, n)
        want, total = _hevc_expected(doc_id, n)
        assert total == len(data)
        got = [
            (
                k,
                r["offset"],
                r["start_code_len"],
                r["nal_len"],
                r["nal_type"],
                r["nuh_layer_id"],
                r["temporal_id"],
                r["is_irap"],
                r["is_idr"],
                r["first_slice"],
            )
            for k, r in enumerate(parse_annexb_hevc(data))
        ]
        assert got == want, doc_id


def test_hevc_refusals_and_header_rules():
    from web_scraper_spark.operators.h264 import parse_annexb_hevc, synth_hevc

    assert parse_annexb_hevc(b"") is None
    assert parse_annexb_hevc(b"\x42" * 32) is None
    data = synth_hevc(2, 4)
    # temporal_id_plus1 == 0 is forbidden (§7.4.2.2): that NAL skipped
    bad = bytearray(data)
    bad[5] &= 0xF8  # VPS header byte1 -> tid_plus1 = 0
    assert [r["nal_type"] for r in parse_annexb_hevc(bytes(bad))][0] == 33
    # forbidden bit -> skipped
    bad = bytearray(data)
    bad[4] |= 0x80
    assert [r["nal_type"] for r in parse_annexb_hevc(bytes(bad))][0] == 33
    # 1-byte truncated header at EOF -> that NAL dropped cleanly
    cut = data[:12] + b"\x00\x00\x01\x42"
    nals = parse_annexb_hevc(cut)
    assert [r["nal_type"] for r in nals] == [32]


def test_hevc_stage_matches_formulas_no_shuffle(spark):
    from web_scraper_spark.operators.h264 import hevc_nal_index, with_synth_hevc

    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    out = hevc_nal_index(with_synth_hevc(docs))
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == 24
    for d in range(24):
        want, _ = _hevc_expected(d, 4 + d % 8)
        got = [
            (
                r.nal_idx,
                r.offset,
                r.start_code_len,
                r.nal_len,
                r.nal_type,
                r.nuh_layer_id,
                r.temporal_id,
                r.is_irap,
                r.is_idr,
                r.first_slice,
            )
            for r in sorted(by_doc[d], key=lambda r: r.nal_idx)
        ]
        assert got == want, d
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
