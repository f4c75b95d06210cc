"""TAR archive index — REAL ustar 512-byte header walk (POSIX.1-1988
pax/ustar layout, the published tar byte format).

Web corpora and dataset dumps ship as .tar / .tar.gz; the archive
structure is pure byte arithmetic: 512-byte headers with octal size
fields, checksum-verified (the checksum field itself counted as
spaces), members padded to the 512 grid, two zero blocks terminating
the archive. The index emits each member's exact header and data byte
extents — the range-read unit a 100 TB pipeline fans out, exactly the
contract of zip_entry_index next door. (The outer gzip of .tar.gz is
the WARC reader's streaming-member problem, already solved in
sources/warc.py; this module indexes the decompressed stream.)

Untrusted-input discipline: octal sizes are bounded against the
payload before any skip, a failed checksum refuses the archive (a
corrupt header would otherwise mis-frame every later member), and the
walk is capped at 65535 members.

Reference scope: no archive path in the reference (SURVEY.md §2.8);
beyond-reference multimodal/webtext mandate alongside zipindex.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "parse_tar_entries",
    "tar_entry_index",
    "synth_tar",
    "with_synth_tar",
]

_MAX_MEMBERS = 65535


def _octal(field: bytes):
    s = field.split(b"\0")[0].strip()
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError:
        return None


def parse_tar_entries(data: bytes):
    """Rows ``(entry_idx, name, size, typeflag, header_off, data_off)``
    for every member, in archive order; ``None`` when a header fails
    its checksum or declares a size beyond the payload (a mis-framed
    member would corrupt every extent after it)."""
    if len(data) < 512:
        return None
    rows = []
    pos = 0
    idx = 0
    while pos + 512 <= len(data):
        block = data[pos : pos + 512]
        if block == b"\0" * 512:
            break  # end-of-archive marker
        size = _octal(block[124:136])
        chk = _octal(block[148:156])
        if size is None or chk is None or size < 0:
            return None
        if pos + 512 + size > len(data):
            return None  # declared size beyond the payload
        # checksum: header bytes with the checksum field read as spaces
        calc = sum(block[:148]) + 8 * 0x20 + sum(block[156:])
        if calc != chk:
            return None
        name = block[0:100].split(b"\0", 1)[0]
        if block[257:262] == b"ustar":
            prefix = block[345:500].split(b"\0", 1)[0]
            if prefix:
                name = prefix + b"/" + name
        rows.append(
            (
                idx,
                name.decode("utf-8", "replace"),
                size,
                block[156:157].decode("latin-1"),
                pos,
                pos + 512,
            )
        )
        idx += 1
        if idx > _MAX_MEMBERS:
            return None
        pos += 512 + ((size + 511) // 512) * 512
    if not rows:
        return None
    return rows


# ---------------------------------------------------------------------------
# deterministic synthesis
# ---------------------------------------------------------------------------


def synth_tar_n_members(doc_id: int) -> int:
    return 2 + doc_id % 4


def synth_tar_member_len(doc_id: int, i: int) -> int:
    return 10 + (doc_id * 3 + i * 7) % 30


def _tar_header(name: bytes, size: int, typeflag: bytes) -> bytes:
    h = bytearray(512)
    h[0 : len(name)] = name
    h[100:108] = b"0000644\0"
    h[108:116] = b"0000000\0"
    h[116:124] = b"0000000\0"
    h[124:136] = b"%011o\0" % size
    h[136:148] = b"00000000000\0"
    h[148:156] = b" " * 8  # checksum slot as spaces while summing
    h[156:157] = typeflag
    h[257:263] = b"ustar\0"
    h[263:265] = b"00"
    chk = sum(h)
    h[148:156] = b"%06o\0 " % chk
    return bytes(h)


def synth_tar(doc_id: int) -> bytes:
    """A POSIX-ustar archive whose layout is pure formulas: ``n = 2 +
    id % 4`` members ``m{i}.txt`` of ``10 + (id*3 + i*7) % 30`` bytes —
    every member is under one data block, so member i's header sits at
    exactly ``1024*i`` and its data at ``1024*i + 512`` (the closed
    form the DuckDB oracle replays), with the standard two zero blocks
    at the end."""
    out = bytearray()
    for i in range(synth_tar_n_members(doc_id)):
        size = synth_tar_member_len(doc_id, i)
        payload = bytes(0x20 + (doc_id * 5 + i * 3 + k) % 90 for k in range(size))
        out += _tar_header(f"m{i}.txt".encode(), size, b"0")
        out += payload + bytes(512 - size)
    out += bytes(1024)
    return bytes(out)


def with_synth_tar(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def _synth(ids: pd.Series) -> pd.Series:
        return pd.Series([synth_tar(int(i)) for i in ids])

    return df.withColumn("data", _synth(F.col(id_col)))


_TAR_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("entry_idx", IntegerType(), False),
        StructField("name", StringType(), False),
        StructField("size", LongType(), False),
        StructField("typeflag", StringType(), False),
        StructField("header_off", LongType(), False),
        StructField("data_off", LongType(), False),
    ]
)


def tar_entry_index(
    df: DataFrame, data_col: str = "data", id_col: str = "doc_id"
) -> DataFrame:
    """One row per tar member with checksum-verified byte extents.
    One Arrow pass; non-tar payloads emit nothing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for d, v in zip(b[id_col], b[data_col]):
                ents = parse_tar_entries(bytes(v)) if v is not None else None
                for i, nm, sz, tf, ho, do in ents or ():
                    rows.append((int(d), i, nm, sz, tf, ho, do))
            yield pd.DataFrame.from_records(
                rows, columns=[f.name for f in _TAR_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=_TAR_SCHEMA)
