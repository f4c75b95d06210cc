"""MPEG-TS packet index (operators/mpegts.py): 188-byte grid walk
with PID/PUSI/AF/PCR decoding, PES-start detection, bounded resync
over leading junk, damage refusals, and the Spark stage contract
(no shuffle, formula parity). Also pins the demux loop: filtering one
PID's payload extents rebuilds the exact elementary stream that the
ADTS walker then indexes."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_scraper_spark.operators.mpegts import (
    TS_PACKET,
    mpegts_packet_index,
    synth_pcr_base,
    synth_ts,
    synth_ts_fields,
    ts_packets,
    with_synth_ts,
)

_STREAM = {0: 0xE0, 256: 0xE0, 257: 0xC0}


def _expected(doc_id: int, n: int):
    rows = []
    for i in range(n):
        pid, pusi, has_af, has_pcr, cc = synth_ts_fields(doc_id, i)
        poff = 4 + ((1 + (7 if has_pcr else 1)) if has_af else 0)
        rows.append(
            (
                i,
                i * TS_PACKET,
                pid,
                pusi,
                3 if has_af else 1,
                cc,
                pusi if has_af else 0,
                synth_pcr_base(doc_id, i) if has_pcr else None,
                poff,
                TS_PACKET - poff,
                _STREAM[pid] if pusi else None,
            )
        )
    return rows


def _tuples(pkts):
    return [
        (
            p["pkt_idx"],
            p["offset"],
            p["pid"],
            p["pusi"],
            p["afc"],
            p["cc"],
            p["random_access"],
            p["pcr_base"],
            p["payload_off"],
            p["payload_len"],
            p["pes_stream_id"],
        )
        for p in pkts
    ]


def test_ts_parity_sweep():
    for doc_id in range(32):
        n = 12 + doc_id % 8
        data = synth_ts(doc_id, n)
        assert len(data) == n * TS_PACKET  # packets tile the segment
        assert _tuples(ts_packets(data)) == _expected(doc_id, n), doc_id


def test_ts_resync_truncation_and_refusals():
    data = synth_ts(3, 14)
    # truncated final packet dropped
    assert len(ts_packets(data[:-10])) == 13
    # leading junk skipped; offsets keep the true byte positions
    got = ts_packets(b"\x11\x22\x33" + data)
    assert len(got) == 14 and got[0]["offset"] == 3
    # a decoy 0x47 in the junk must not anchor the grid (double-sync)
    got = ts_packets(b"\x47\x22\x33" + data)
    assert got[0]["offset"] == 3
    # sync loss mid-stream: complete prefix kept
    broken = bytearray(data)
    broken[5 * TS_PACKET] = 0x00
    assert len(ts_packets(bytes(broken))) == 5
    # transport_error_indicator ends the walk
    tei = bytearray(data)
    tei[3 * TS_PACKET + 1] |= 0x80
    assert len(ts_packets(bytes(tei))) == 3
    # adaptation field overrunning the packet refuses packet 0 -> None
    ovr = bytearray(data)
    ovr[4] = 200
    assert ts_packets(bytes(ovr)) is None
    # all junk / empty
    assert ts_packets(b"\x00" * 5000) is None
    assert ts_packets(b"") is None


def test_ts_demux_rebuilds_elementary_stream():
    # concatenating one PID's payload extents is the demux a 100 TB
    # pipeline runs before the ES indexes; pin it end-to-end in-row
    from web_scraper_spark.operators.audio import adts_frames, synth_adts

    es = synth_adts(5, 5)[10 + 5 % 7 :]  # raw ADTS frames, no ID3
    # pack the ES into TS packets on PID 257 (PUSI on the first)
    pkts = bytearray()
    pos = 0
    idx = 0
    while pos < len(es):
        chunk = es[pos : pos + TS_PACKET - 4]
        pusi = 1 if pos == 0 else 0
        hdr = bytes([0x47, (pusi << 6) | 1, 0x01, 0x10 | (idx % 16)])
        body = bytes(chunk)
        if len(body) < TS_PACKET - 4:
            # pad with an adaptation field up front (afc=3)
            af_len = TS_PACKET - 4 - len(body) - 1
            hdr = bytes([0x47, (pusi << 6) | 1, 0x01, 0x30 | (idx % 16)])
            body = bytes([af_len, 0x00]) + bytes(af_len - 1) + bytes(chunk)
        pkts += hdr + body
        pos += len(chunk)
        idx += 1
    parsed = ts_packets(bytes(pkts))
    rebuilt = b"".join(
        bytes(pkts)[p["offset"] + p["payload_off"] :
                    p["offset"] + p["payload_off"] + p["payload_len"]]
        for p in parsed
        if p["pid"] == 257
    )
    assert rebuilt == es
    assert adts_frames(rebuilt) == adts_frames(es)


def test_ts_stage_matches_formulas_no_shuffle(spark):
    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    out = mpegts_packet_index(with_synth_ts(docs))
    rows = out.collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == 24
    for d in range(24):
        want = _expected(d, 12 + d % 8)
        got = [
            (
                r.pkt_idx,
                r.offset,
                r.pid,
                r.pusi,
                r.afc,
                r.cc,
                r.random_access,
                r.pcr_base,
                r.payload_off,
                r.payload_len,
                r.pes_stream_id,
            )
            for r in sorted(by_doc[d], key=lambda r: r.pkt_idx)
        ]
        assert got == want, d
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
