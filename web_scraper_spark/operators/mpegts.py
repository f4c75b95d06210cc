"""Codec-free MPEG transport-stream (TS) packet index.

HLS media segments — the dominant web-video delivery unit — are
MPEG-TS files (ISO/IEC 13818-1, public spec): fixed 188-byte packets,
each with a 4-byte header carrying the PID (demux routing key), a
payload_unit_start_indicator, and an optional adaptation field with
the PCR clock and random-access flag. The elementary streams inside
(H.264/HEVC Annex-B video, ADTS AAC audio) are exactly what
operators/h264.py and operators/audio.py index — this walk is the
demux layer that fans a 100 TB segment corpus out to them:

- **per-packet byte extents + PID** — a downstream job filters one
  PID's packets and concatenates payload extents to rebuild its
  elementary stream, all byte-range arithmetic;
- **PUSI + PES start detection** — packet boundaries where a PES
  packet (and typically an access unit) begins, with the PES
  stream_id when the payload opens with the 0x000001 start code;
- **random_access_indicator + PCR** — keyframe-aligned entry points
  and the program clock for segment-level timing, no codec work.

Contract (shared with every media walker in this package): malformed
payloads yield nothing — never a stage failure, never an unbounded
allocation (everything is bounded by the 188-byte packet grid).
Sync loss mid-stream ends the walk at the last good packet; leading
junk is skipped by a bounded double-sync probe (0x47 at i and i+188).

Reference behavior: public spec only. The scraper reference has no
media tier; this extends SURVEY.md §2.10's multimodal family.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

__all__ = [
    "ts_packets",
    "synth_ts",
    "mpegts_packet_index",
    "with_synth_ts",
]

TS_PACKET = 188
TS_SYNC = 0x47

_MAX_RESYNC = 2048


def ts_packets(data: bytes):
    """Walk 188-byte TS packets -> list of packet dicts, or None when
    no sync is found.

    Dict keys: ``pkt_idx``, ``offset``, ``pid``, ``pusi``,
    ``afc`` (adaptation_field_control), ``cc`` (continuity counter),
    ``random_access`` (adaptation-field flag; 0 without an AF),
    ``pcr_base`` (33-bit PCR base when the AF carries one, else
    None), ``payload_off`` / ``payload_len`` (byte extent of the
    payload inside the packet; 0-length when the AF fills it or AFC
    has no payload), and ``pes_stream_id`` (when PUSI is set and the
    payload opens with the 0x000001 PES start code, else None).

    Packets with a set transport_error_indicator, AFC 00 (reserved),
    or an adaptation field overrunning the packet end the walk —
    complete packets before the damage are kept. A truncated final
    packet is dropped.
    """
    n = len(data)
    pos = 0
    scanned = 0
    # bounded leading-junk skip: demand sync at pos and — when another
    # full packet fits — at pos+188 too (a lone 0x47 inside junk must
    # not anchor the grid)
    while pos + TS_PACKET <= n:
        if data[pos] == TS_SYNC and (
            pos + 2 * TS_PACKET > n or data[pos + TS_PACKET] == TS_SYNC
        ):
            break
        pos += 1
        scanned += 1
        if scanned > _MAX_RESYNC:
            return None
    out = []
    while pos + TS_PACKET <= n:
        if data[pos] != TS_SYNC:
            break  # sync loss: keep complete prefix
        b1, b2, b3 = data[pos + 1], data[pos + 2], data[pos + 3]
        if b1 & 0x80:
            break  # transport_error_indicator
        pid = ((b1 & 0x1F) << 8) | b2
        pusi = (b1 >> 6) & 1
        afc = (b3 >> 4) & 0x3
        cc = b3 & 0x0F
        if afc == 0:
            break  # reserved
        payload_off = 4
        random_access = 0
        pcr_base = None
        if afc in (2, 3):
            af_len = data[pos + 4]
            if 5 + af_len > TS_PACKET:
                break  # AF overruns the packet
            if af_len >= 1:
                flags = data[pos + 5]
                random_access = (flags >> 6) & 1
                if flags & 0x10 and af_len >= 7:
                    # PCR: 33-bit base, 6 reserved, 9-bit extension
                    p = data[pos + 6 : pos + 12]
                    pcr_base = (
                        (p[0] << 25)
                        | (p[1] << 17)
                        | (p[2] << 9)
                        | (p[3] << 1)
                        | (p[4] >> 7)
                    )
            payload_off = 5 + af_len
        payload_len = TS_PACKET - payload_off if afc in (1, 3) else 0
        pes_stream_id = None
        if pusi and payload_len >= 4:
            p0 = pos + payload_off
            if data[p0] == 0 and data[p0 + 1] == 0 and data[p0 + 2] == 1:
                pes_stream_id = data[p0 + 3]
        out.append(
            {
                "pkt_idx": len(out),
                "offset": pos,
                "pid": pid,
                "pusi": pusi,
                "afc": afc,
                "cc": cc,
                "random_access": random_access,
                "pcr_base": pcr_base,
                "payload_off": payload_off,
                "payload_len": payload_len,
                "pes_stream_id": pes_stream_id,
            }
        )
        pos += TS_PACKET
    return out or None


# ---------------------------------------------------------------------------
# Deterministic synth segment (every field a formula of doc_id, i)
# ---------------------------------------------------------------------------

_SYNTH_PIDS = (0, 256, 257)  # PAT, video PES, audio PES
_SYNTH_STREAM_IDS = {0: 0xE0, 256: 0xE0, 257: 0xC0}


def synth_ts_fields(doc_id: int, i: int):
    """(pid, pusi, has_af, has_pcr, cc) for packet i — all formulas.
    PID cycles PAT/video/audio; PUSI every 4th packet; an adaptation
    field on every 3rd packet, carrying a PCR on every 6th; the
    continuity counter counts per-PID occurrences mod 16."""
    pid = _SYNTH_PIDS[i % 3]
    pusi = 1 if i % 4 == 0 else 0
    has_af = 1 if i % 3 == 0 else 0
    has_pcr = 1 if i % 6 == 0 else 0
    cc = (i // 3) % 16
    return pid, pusi, has_af, has_pcr, cc


def synth_pcr_base(doc_id: int, i: int) -> int:
    return (doc_id * 90000 + i * 3003) % (1 << 33)


def synth_ts(doc_id: int, n_packets: int) -> bytes:
    """A structurally valid TS segment of ``n_packets`` 188-byte
    packets per :func:`synth_ts_fields`; PUSI packets open their
    payload with a PES start code (video stream_id 0xE0 / audio 0xC0),
    AF packets carry an 8-byte adaptation field (with PCR when
    scheduled, random_access on PUSI), and all filler is a formula of
    (doc_id, i)."""
    out = bytearray()
    for i in range(n_packets):
        pid, pusi, has_af, has_pcr, cc = synth_ts_fields(doc_id, i)
        afc = 3 if has_af else 1
        pkt = bytearray([TS_SYNC, (pusi << 6) | (pid >> 8), pid & 0xFF,
                         (afc << 4) | cc])
        if has_af:
            af_len = 7 if has_pcr else 1
            flags = (0x40 if pusi else 0) | (0x10 if has_pcr else 0)
            pkt += bytes([af_len, flags])
            if has_pcr:
                base = synth_pcr_base(doc_id, i)
                pkt += bytes(
                    [
                        (base >> 25) & 0xFF,
                        (base >> 17) & 0xFF,
                        (base >> 9) & 0xFF,
                        (base >> 1) & 0xFF,
                        ((base & 1) << 7) | 0x7E,
                        0x00,
                    ]
                )
        if pusi:
            pkt += bytes([0, 0, 1, _SYNTH_STREAM_IDS[pid]])
        while len(pkt) < TS_PACKET:
            pkt.append(0x40 + (doc_id * 3 + i * 7 + len(pkt)) % 0xBF)
        out += pkt
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark stage
# ---------------------------------------------------------------------------

_TS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("pkt_idx", IntegerType(), False),
        StructField("offset", LongType(), False),
        StructField("pid", IntegerType(), False),
        StructField("pusi", IntegerType(), False),
        StructField("afc", IntegerType(), False),
        StructField("cc", IntegerType(), False),
        StructField("random_access", IntegerType(), False),
        StructField("pcr_base", LongType(), True),
        StructField("payload_off", IntegerType(), False),
        StructField("payload_len", IntegerType(), False),
        StructField("pes_stream_id", IntegerType(), True),
    ]
)


def mpegts_packet_index(
    df: DataFrame, data_col: str = "data", id_col: str = "doc_id"
) -> DataFrame:
    """One row per TS packet with PID routing, PES-start detection,
    PCR, and the payload byte extent — the demux layer that fans an
    HLS segment corpus out to the elementary-stream indexes.
    Arrow-batched mapInPandas, bytes never shuffle; undecodable
    payloads emit nothing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for d, v in zip(b[id_col], b[data_col]):
                pkts = ts_packets(bytes(v)) if v is not None else None
                for p in pkts or ():
                    rows.append(
                        {
                            "doc_id": int(d),
                            "pkt_idx": p["pkt_idx"],
                            "offset": p["offset"],
                            "pid": p["pid"],
                            "pusi": p["pusi"],
                            "afc": p["afc"],
                            "cc": p["cc"],
                            "random_access": p["random_access"],
                            "pcr_base": p["pcr_base"],
                            "payload_off": p["payload_off"],
                            "payload_len": p["payload_len"],
                            "pes_stream_id": p["pes_stream_id"],
                        }
                    )
            yield pd.DataFrame.from_records(
                rows, columns=[f.name for f in _TS_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=_TS_SCHEMA)


def with_synth_ts(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture stage: TS segment with ``n = 12 + id%8`` packets."""

    @pandas_udf(BinaryType())
    def _synth(ids: pd.Series) -> pd.Series:
        return pd.Series([synth_ts(int(i), 12 + int(i) % 8) for i in ids])

    return df.withColumn("data", _synth(F.col(id_col)))
