"""TAR archive index (operators/tarindex.py): ustar formula parity,
stdlib-tarfile cross-validation, checksum enforcement, size-bomb
bounds, and the Spark stage contract."""

from __future__ import annotations

import io
import random
import tarfile

from pyspark.sql import functions as F

from web_scraper_spark.operators.tarindex import (
    _tar_header,
    parse_tar_entries,
    synth_tar,
    synth_tar_member_len,
    synth_tar_n_members,
    tar_entry_index,
    with_synth_tar,
)


def _expected(doc_id: int):
    return [
        (
            i,
            f"m{i}.txt",
            synth_tar_member_len(doc_id, i),
            "0",
            1024 * i,
            1024 * i + 512,
        )
        for i in range(synth_tar_n_members(doc_id))
    ]


def test_entry_formula_parity():
    for doc_id in range(32):
        assert parse_tar_entries(synth_tar(doc_id)) == _expected(doc_id), doc_id


def test_stdlib_tarfile_agrees():
    for doc_id in (0, 3, 9):
        data = synth_tar(doc_id)
        tf = tarfile.open(fileobj=io.BytesIO(data))
        members = tf.getmembers()
        assert [m.name for m in members] == [
            f"m{i}.txt" for i in range(synth_tar_n_members(doc_id))
        ]
        for i, m in enumerate(members):
            size = synth_tar_member_len(doc_id, i)
            want = bytes(
                0x20 + (doc_id * 5 + i * 3 + k) % 90 for k in range(size)
            )
            assert tf.extractfile(m).read() == want
            # the emitted extent slices the identical bytes
            assert data[1024 * i + 512 : 1024 * i + 512 + size] == want


def test_ustar_prefix_long_paths():
    h = bytearray(_tar_header(b"leaf.txt", 0, b"0"))
    h[345 : 345 + 9] = b"deep/path"
    h[148:156] = b" " * 8
    chk = sum(h)
    h[148:156] = b"%06o\0 " % chk
    data = bytes(h) + bytes(1024)
    assert parse_tar_entries(data) == [(0, "deep/path/leaf.txt", 0, "0", 0, 512)]


def test_checksum_corruption_refused():
    bad = bytearray(synth_tar(2))
    bad[0] ^= 0xFF  # name byte flipped: checksum no longer matches
    assert parse_tar_entries(bytes(bad)) is None


def test_size_bomb_with_valid_checksum_refused():
    # a header DECLARING 8 GiB with a correctly recomputed checksum
    # must still be refused because the data cannot be present
    h = bytearray(_tar_header(b"huge.bin", 0, b"0"))
    h[124:136] = b"77777777777\0"
    h[148:156] = b" " * 8
    chk = sum(h)
    h[148:156] = b"%06o\0 " % chk
    assert parse_tar_entries(bytes(h) + bytes(1024)) is None


def test_malformed_never_raises():
    d = synth_tar(5)
    for cut in range(0, len(d), 7):
        parse_tar_entries(d[:cut])
    rng = random.Random(13)
    for _ in range(300):
        parse_tar_entries(
            bytes(rng.randrange(256) for _ in range(rng.randrange(1200)))
        )
    assert parse_tar_entries(b"") is None
    assert parse_tar_entries(bytes(1024)) is None  # only end marker


def test_tar_stage(spark):
    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    out = tar_entry_index(with_synth_tar(docs))
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for d in range(24):
        got = [
            (r.entry_idx, r.name, r.size, r.typeflag, r.header_off, r.data_off)
            for r in sorted(by_doc[d], key=lambda r: r.entry_idx)
        ]
        assert got == _expected(d), d
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    rows = [
        (1, bytearray(synth_tar(1))),
        (2, bytearray(b"\x00" * 100)),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, data binary")
    got = tar_entry_index(df).collect()
    assert {r.doc_id for r in got} == {1}
