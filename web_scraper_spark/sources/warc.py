"""WARC (ISO 28500 / Common Crawl) ingestion — the archive format the
north-rule input table ("Common-Crawl-style web pages") ships in.

``read_warc(spark, path)`` turns a directory of ``.warc`` /
``.warc.gz`` files into the engine's pages shape: one row per
``response`` record with ``(url, warc_ts, http_status, content_type,
html binary)`` plus record-level lineage. The reference has no archive
ingestion at all (it fetches live through Selenium —
``/root/reference/src/core/tracker/nausys_tracker.py:257-268``); this
source exists so the crawl engine can bootstrap/backfill a frontier
from an existing archive, the standard way web-scale corpora arrive.

Scale shape:

- **File-grain parallelism.** Common Crawl's convention is ~1 GiB
  WARC files, millions of them per crawl; ``binaryFile`` gives one
  task per file, which is the right grain because WARC-gzip is
  record-member-compressed and has no intra-file split points a
  generic reader can find. A 100 TB archive is ~10^5 files → ample
  tasks for any executor count; ``maxPartitionBytes`` is irrelevant
  here (each file is one row).
- **Length-driven parsing, not scanning.** Records are walked by
  ``Content-Length`` — a body that itself contains ``WARC/1.0`` or
  CRLF runs cannot confuse the parser (regex/split-based readers get
  this wrong; tests pin it). On malformed input the parser resyncs to
  the next record header and reports the skip in ``warc_errors``
  rather than failing the file; errors at the very tail (truncated
  final record) surface as a final all-NULL row carrying the count.
- **Bounded memory per task.** Gzip members are decompressed
  incrementally (``zlib`` with ``unused_data`` member chaining) and
  the record walker consumes the buffer as it parses, so a task's
  live set is ~one record + 1 MiB — not the several-GiB whole-file
  decompression a ~1 GiB member-compressed Common Crawl WARC would
  otherwise pin per concurrent task.
- **Arrow-batched.** One ``mapInPandas`` stage, no per-row Python
  UDF; the wide body bytes enter Arrow once and are never shuffled
  (downstream consumers project before any exchange, same contract as
  ``extract_pages``).

``render_warc`` (pure Python) is the writer twin used by fixtures and
round-trip tests; the ``warc_roundtrip`` battery row renders records
natively in SQL expressions and parses them back with this module, so
the DuckDB oracle can state the expected output directly from the
source rows.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

__all__ = [
    "read_warc",
    "parse_warc",
    "render_warc",
    "wet_record",
    "WARC_RECORD_SCHEMA",
]

_CRLF = b"\r\n"
_HDR = b"WARC/1.0\r\n"

WARC_RECORD_SCHEMA = StructType(
    [
        StructField("url", StringType(), True),
        StructField("warc_ts", StringType(), True),  # ISO-8601 as written
        StructField("warc_type", StringType(), True),
        StructField("http_status", IntegerType(), True),
        StructField("content_type", StringType(), True),
        StructField("html", BinaryType(), True),
        StructField("n_body_bytes", LongType(), True),
        StructField("record_offset", LongType(), True),
        StructField("warc_errors", IntegerType(), True),
    ]
)


def wet_record(url, date_iso, text):
    """WET conversion record as a NATIVE Column expression (the
    distributed writer for extracted-text sidecars, Common Crawl's
    ``.warc.wet`` convention): ``WARC-Type: conversion`` headers, the
    plain-text payload verbatim (no HTTP envelope), Content-Length =
    ``octet_length`` of the text (multi-byte-safe). A whole corpus
    renders inside codegen — text enters no Python — and packs into
    archive blobs with a per-file ``collect_list``; ``parse_warc``
    reads the result back like any other record type."""
    from pyspark.sql import functions as F

    return F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
        url,
        F.lit("\r\nWARC-Date: "),
        date_iso,
        F.lit("\r\nContent-Type: text/plain\r\nContent-Length: "),
        F.octet_length(text).cast("string"),
        F.lit("\r\n\r\n"),
        text,
        F.lit("\r\n\r\n"),
    )


def render_warc(
    url: str,
    date_iso: str,
    body: bytes,
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
    warc_type: str = "response",
) -> bytes:
    """One WARC record (writer twin of the parser): WARC headers,
    blank line, payload, record terminator. ``response`` records wrap
    ``body`` in an HTTP response envelope; other types carry ``body``
    verbatim as the record payload."""
    if warc_type == "response":
        http = (
            f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: {content_type}\r\n\r\n"
        ).encode() + body
    else:
        http = body
    warc_headers = (
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date_iso}\r\n"
        f"Content-Length: {len(http)}\r\n"
    ).encode()
    return _HDR + warc_headers + _CRLF + http + _CRLF + _CRLF


_GZ_CHUNK = 1 << 20  # feed gzip members in 1 MiB slices


def _iter_decompressed(blob: bytes) -> Iterator[bytes]:
    """Stream-decompress a (possibly multi-member) gzip blob, yielding
    bounded chunks — never the whole decompressed file at once. Common
    Crawl WARCs are member-per-record compressed; ``gzip.decompress``
    would materialize several GiB of heap per ~1 GiB file-grain task,
    this keeps the live set to one record plus ``_GZ_CHUNK``. A
    truncated/garbled trailing member stops the stream (the record
    walker surfaces it as a trailing ``warc_errors`` row)."""
    view = memoryview(blob)
    pos, n = 0, len(blob)
    while pos < n:
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        try:
            while pos < n and not d.eof:
                chunk = view[pos : pos + _GZ_CHUNK]
                pos += len(chunk)
                out = d.decompress(chunk)
                if out:
                    yield out
        except zlib.error:
            return  # corrupt member: emit what decoded, stop
        if not d.eof:
            return  # truncated final member
        pos -= len(d.unused_data)  # unused bytes start the next member


def _parse_file(blob: bytes) -> Iterator[tuple]:
    """Yield one tuple per record in one WARC file's bytes.

    Walks by Content-Length over an INCREMENTALLY decompressed buffer
    (memory stays bounded by one record + one gzip chunk, not the whole
    decompressed file); on any malformed header block, scans forward to
    the next ``WARC/1.0\\r\\n`` and counts the resync in the next
    yielded record's ``warc_errors``. Errors at the tail of the file
    (truncated final record, trailing junk) are surfaced as a final
    all-NULL row carrying the error count rather than silently dropped.
    """
    chunks: Iterator[bytes] = (
        _iter_decompressed(blob) if blob[:2] == b"\x1f\x8b" else iter((blob,))
    )
    buf = bytearray()
    base = 0  # absolute offset of buf[0] in the decompressed stream
    eof = False
    errors = 0

    def pull() -> bool:
        nonlocal eof
        if eof:
            return False
        try:
            buf.extend(next(chunks))
            return True
        except StopIteration:
            eof = True
            return False

    def find(marker: bytes, from_: int) -> int:
        scan = from_
        while True:
            idx = buf.find(marker, scan)
            if idx >= 0:
                return idx
            scan = max(from_, len(buf) - len(marker) + 1)
            if not pull():
                return -1

    def have(upto: int) -> bool:
        while len(buf) < upto:
            if not pull():
                return False
        return True

    pos = 0  # cursor into buf
    while True:
        # locate next record header; compact consumed/junk prefix so a
        # long non-WARC run cannot grow the buffer unboundedly
        if pos > 0:
            del buf[:pos]
            base += pos
            pos = 0
        junked = False
        while True:
            start_rel = buf.find(_HDR)
            if start_rel >= 0:
                break
            # keep only a marker-sized tail while scanning: a long
            # non-WARC junk run must not accumulate in the buffer
            if len(buf) >= len(_HDR):
                cut = len(buf) - len(_HDR) + 1
                del buf[:cut]
                base += cut
                junked = True
            if not pull():
                start_rel = -1
                break
        if start_rel < 0:
            if len(buf) > 0 or junked:
                errors += 1  # trailing junk after the last record
            break
        if start_rel != 0 or junked:
            errors += 1  # junk between records
            del buf[:start_rel]
            base += start_rel
        start = base
        cursor = len(_HDR)
        hdr_end = find(_CRLF + _CRLF, cursor)
        if hdr_end < 0:
            errors += 1  # truncated header block at EOF
            break
        headers: dict[str, str] = {}
        ok = True
        for line in bytes(buf[cursor:hdr_end]).split(_CRLF):
            k, sep, v = line.partition(b":")
            if not sep:
                ok = False
                break
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1"
            )
        length = headers.get("content-length", "")
        if not ok or not length.isdigit():
            errors += 1
            pos = 1  # resync: search again past this header
            continue
        body_start = hdr_end + 4
        body_end = body_start + int(length)
        if not have(body_end):
            errors += 1  # truncated final record
            break
        payload = bytes(buf[body_start:body_end])
        pos = body_end
        if have(pos + 4) and bytes(buf[pos : pos + 4]) == _CRLF + _CRLF:
            pos += 4

        status: int | None = None
        ctype: str | None = None
        body: bytes = payload
        if headers.get("warc-type") == "response":
            http_end = payload.find(_CRLF + _CRLF)
            if http_end >= 0:
                http_lines = payload[:http_end].split(_CRLF)
                parts = http_lines[0].split(b" ")
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                for line in http_lines[1:]:
                    k, sep, v = line.partition(b":")
                    if sep and k.strip().lower() == b"content-type":
                        ctype = v.strip().decode("latin-1")
                body = payload[http_end + 4 :]
        yield (
            headers.get("warc-target-uri"),
            headers.get("warc-date"),
            headers.get("warc-type"),
            status,
            ctype,
            body,
            len(body),
            start,
            errors,
        )
        errors = 0
    if errors:
        # tail errors (truncated final record / header, trailing junk)
        # have no following record to ride on — surface them as a final
        # all-NULL row instead of silently dropping them
        yield (None, None, None, None, None, None, 0, base, errors)


def parse_warc(files: DataFrame, content_col: str = "content") -> DataFrame:
    """(… ``content_col`` binary …) → one row per WARC record
    (``WARC_RECORD_SCHEMA``). Each input row holds ONE WARC file's
    bytes (plain or gzip). Arrow-batched. If the input has a ``path``
    column (``binaryFile`` provides one) it is carried through as
    ``source_path`` so ``(source_path, record_offset)`` is a full
    record lineage key."""
    import pandas as pd

    has_path = "path" in files.columns
    out_schema = WARC_RECORD_SCHEMA
    if has_path:
        out_schema = StructType(
            [StructField("source_path", StringType(), True)]
            + list(WARC_RECORD_SCHEMA.fields)
        )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [f.name for f in out_schema.fields]
        for pdf in batches:
            rows: list[tuple] = []
            for i, blob in enumerate(pdf[content_col]):
                if blob is None:
                    continue
                for rec in _parse_file(bytes(blob)):
                    rows.append((pdf["path"].iloc[i], *rec) if has_path else rec)
            yield pd.DataFrame(rows, columns=cols)

    keep = ["path", content_col] if has_path else [content_col]
    return files.select(*keep).mapInPandas(run, out_schema)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of ``.warc`` / ``.warc.gz`` files → records.
    One task per file (``binaryFile``); see module docstring for why
    that is the correct grain for WARC."""
    return parse_warc(
        spark.read.format("binaryFile").load(path), content_col="content"
    )
