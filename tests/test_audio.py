"""REAL WAV/PCM decode (operators/audio.py): container roundtrip,
sample-exact decode across PCM widths, RIFF-quirk tolerance, and the
Spark stages' null-safety + no-shuffle plan shape."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from web_scraper_spark.operators.audio import (
    audio_frame_windows,
    decode_audio_features,
    decode_wav_samples,
    parse_wav,
    synth_samples,
    synth_wav_pcm16,
    with_synth_wav,
)


def test_synth_parse_roundtrip():
    for doc_id, frames, rate, ch in [(0, 400, 8000, 1), (7, 999, 16000, 2)]:
        wav = synth_wav_pcm16(doc_id, frames, rate, ch)
        hdr = parse_wav(wav)
        assert hdr == (1, ch, rate, 16, frames, 44, frames * ch * 2)
        _, s = decode_wav_samples(wav)
        assert np.array_equal(s, synth_samples(doc_id, frames * ch))


def test_extra_chunks_and_odd_padding():
    """Real encoders put LIST/fact chunks between fmt and data; odd-size
    chunks are word-padded per the RIFF spec."""
    wav = synth_wav_pcm16(3, 100, 8000, 1)
    fmt_chunk = wav[12:36]  # 'fmt ' + size + 16-byte body
    data_chunk = wav[36:]
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd -> pad
    body = b"WAVE" + fmt_chunk + junk + data_chunk
    wav2 = b"RIFF" + struct.pack("<I", len(body)) + body
    hdr = parse_wav(wav2)
    assert hdr is not None and hdr[4] == 100
    _, s = decode_wav_samples(wav2)
    assert np.array_equal(s, synth_samples(3, 100))


def test_malformed_and_truncated():
    assert parse_wav(b"") is None
    assert parse_wav(b"RIFFxxxxWAVE") is None
    assert parse_wav(b"\x89PNG" + b"\x00" * 64) is None
    wav = synth_wav_pcm16(1, 500, 8000, 2)
    # truncated mid-data: decode what's there, whole frames only
    cut = wav[: 44 + 777]
    hdr = parse_wav(cut)
    assert hdr is not None
    _, s = decode_wav_samples(cut)
    assert len(s) == (777 // 4) * 4 // 2  # whole stereo frames
    # data chunk before any fmt chunk: malformed
    no_fmt = wav[:12] + wav[36:]
    assert parse_wav(no_fmt) is None


def _wav_raw(tag, ch, rate, bits, payload):
    fmt = struct.pack(
        "<HHIIHH", tag, ch, rate, rate * ch * bits // 8, ch * bits // 8, bits
    )
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_pcm_widths_and_float():
    # PCM8 unsigned -> signed rebase
    _, s = decode_wav_samples(_wav_raw(1, 1, 8000, 8, bytes([0, 128, 255]) * 20))
    assert list(s[:3]) == [-128, 0, 127]
    # PCM24 sign extension
    pay = b"\x00\x00\x80" + b"\xff\xff\x7f"  # -2^23, 2^23-1
    _, s = decode_wav_samples(_wav_raw(1, 1, 8000, 24, pay * 10))
    assert list(s[:2]) == [-8388608, 8388607]
    # PCM32
    pay = struct.pack("<ii", -(2**31), 2**31 - 1)
    _, s = decode_wav_samples(_wav_raw(1, 1, 8000, 32, pay * 10))
    assert list(s[:2]) == [-(2**31), 2**31 - 1]
    # IEEE float32 scaled to the 16-bit grid, clipped
    pay = struct.pack("<fff", -1.5, 0.5, 1.0)
    _, s = decode_wav_samples(_wav_raw(3, 1, 8000, 32, pay * 10))
    assert list(s[:3]) == [-32768, 16384, 32767]
    # unknown format tag rejected
    assert decode_wav_samples(_wav_raw(7, 1, 8000, 16, b"\x00" * 40)) is None


def test_features_match_pure_python(spark):
    """Spark stage == direct per-payload computation, and geometry
    columns match the synth parameters."""
    docs = spark.range(0, 8).select(F.col("id").alias("doc_id"))
    out = decode_audio_features(with_synth_wav(docs)).collect()
    assert len(out) == 8
    for r in out:
        frames = 400 + r.doc_id % 600
        assert r.n_frames == frames
        assert r.sample_rate == 8000 * (1 + r.doc_id % 2)
        assert r.channels == 1 + r.doc_id % 2
        s = synth_samples(r.doc_id, frames * r.channels).astype(np.int64)
        ss = int(np.dot(s, s))
        assert r.rms == float(np.sqrt(ss / (len(s) * 32768.0 * 32768.0)))
        assert r.peak == int(np.max(np.abs(s))) / 32768.0
        c0 = s[:: r.channels] >= 0
        assert r.zcr == int(np.sum(c0[1:] != c0[:-1])) / (frames - 1)


def test_null_and_garbage_payloads(spark):
    rows = [(1, None), (2, b"not a wav"), (3, synth_wav_pcm16(3, 400, 8000, 1))]
    df = spark.createDataFrame(rows, "doc_id long, data binary")
    out = {r.doc_id: r for r in decode_audio_features(df).collect()}
    assert out[1].rms is None and out[2].rms is None
    assert out[3].n_frames == 400
    # frame windows silently skip undecodable payloads
    wins = audio_frame_windows(df).groupBy("doc_id").count().collect()
    assert {r.doc_id for r in wins} == {3}


def test_windows_cover_all_frames(spark):
    docs = spark.range(0, 4).select(F.col("id").alias("doc_id"))
    wins = audio_frame_windows(with_synth_wav(docs), window_frames=160)
    per_doc = {r["doc_id"]: r["n"] for r in wins.groupBy("doc_id").agg(
        F.count("*").alias("n")).collect()}
    for d in range(4):
        frames = 400 + d % 600
        assert per_doc[d] == -(-frames // 160)  # ceil


def test_audio_stages_do_not_shuffle(spark):
    """Both stages must run on the scan layout — no Exchange above the
    synth/decode pipeline (bytes never shuffle)."""
    docs = spark.range(0, 8).select(F.col("id").alias("doc_id"))
    plan = (
        decode_audio_features(with_synth_wav(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# MP3 frame index
# ---------------------------------------------------------------------------


def test_mp3_frame_walk_vbr_and_id3():
    from web_scraper_spark.operators.audio import (
        _MP3_BITRATES,
        _MP3_RATES,
        mp3_frames,
        synth_mp3,
    )

    for d in range(16):
        n = 3 + d % 6
        fr = mp3_frames(synth_mp3(d, n))
        assert fr is not None and len(fr) == n
        off = 10 + d % 7  # ID3v2 header + declared junk
        for i, (idx, o, ln, br, sr) in enumerate(fr):
            bi, si, pad = 1 + (d * 3 + i) % 14, i % 3, (d + i) % 2
            want = (144000 * _MP3_BITRATES[bi]) // _MP3_RATES[si] + pad
            assert (idx, o, ln, br, sr) == (
                i, off, want, _MP3_BITRATES[bi], _MP3_RATES[si],
            )
            off += want


def test_mp3_resync_truncation_refusals():
    from web_scraper_spark.operators.audio import mp3_frames, synth_mp3

    assert mp3_frames(b"") is None
    assert mp3_frames(b"\x00" * 5000) is None  # bounded resync gives up
    full = synth_mp3(3, 4)
    part = mp3_frames(full[:-10])  # truncated final frame dropped
    assert part is not None and len(part) == 3
    # leading junk before the first sync word: bounded resync finds it
    assert len(mp3_frames(b"\x12\x34" * 7 + synth_mp3(5, 3)[10:])) == 3
    # free-format (bitrate_idx 0) and reserved rate refuse cleanly
    bad = bytearray(synth_mp3(2, 3))
    first = 10 + 2 % 7
    bad[first + 2] = 0x00  # bitrate idx 0 (free) -> not indexable
    assert mp3_frames(bytes(bad[: first + 4])) is None


def test_mp3_stage_rows(spark):
    from pyspark.sql import functions as F

    from web_scraper_spark.operators.audio import mp3_frame_index, with_synth_mp3

    docs = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    out = mp3_frame_index(with_synth_mp3(docs))
    rows = out.collect()
    assert len(rows) == sum(3 + d % 6 for d in range(12))
    assert {r.sample_rate for r in rows} == {44100, 48000, 32000}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# Ogg page index
# ---------------------------------------------------------------------------


def test_ogg_page_walk_and_crc():
    from web_scraper_spark.operators.audio import ogg_pages, synth_ogg

    for d in range(14):
        n = 3 + d % 7
        pg = ogg_pages(synth_ogg(d, n))
        assert pg is not None and len(pg) == n
        cum = 0
        for i, (idx, off, ln, gran, ser, bos, eos) in enumerate(pg):
            want = 50 + (d * 7 + i * 13) % 60
            assert (idx, off, ln) == (i, 28 * (i + 1) + cum, want)
            assert gran == (i + 1) * 256 + d % 32 and ser == d % 1000
            assert (bos, eos) == (int(i == 0), int(i == n - 1))
            cum += want
    # CRC: one flipped payload byte kills that page, keeps the prefix
    data = synth_ogg(3, 4)
    bad = bytearray(data)
    bad[-5] ^= 0xFF
    assert len(ogg_pages(bytes(bad))) == 3
    assert ogg_pages(b"") is None
    assert ogg_pages(b"OggS" + bytes(30)) is None  # crc of garbage fails


def test_ogg_stage_rows(spark):
    from pyspark.sql import functions as F

    from web_scraper_spark.operators.audio import ogg_page_index, with_synth_ogg

    docs = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    out = ogg_page_index(with_synth_ogg(docs))
    rows = out.collect()
    assert len(rows) == sum(3 + d % 7 for d in range(12))
    assert sum(r.is_bos for r in rows) == 12 and sum(r.is_eos for r in rows) == 12
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
