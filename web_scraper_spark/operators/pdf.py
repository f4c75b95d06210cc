"""PDF document index — REAL classic-xref walk + page-tree traversal,
codec-free (ISO 32000-1 / the published Adobe PDF 1.7 byte layout).

Content-stream DECODING (FlateDecode text runs, fonts, images) needs
codecs and is out of scope; the DOCUMENT STRUCTURE does not: the
``%PDF-`` header, ``startxref`` pointer, classic ``xref`` tables with
20-byte entries, trailer dictionaries with ``/Root``/``/Prev``
(incremental-update chains), indirect-object framing (``N G obj`` …
``endobj``), and the Catalog → Pages → Kids page tree are all fixed
published text/byte layouts. The outputs are exactly what a 100 TB
crawl pipeline fans out before any renderer runs: per-object byte
extents for range reads, page counts for document stats, and per-page
content-stream extents for targeted text extraction.

Operators (Arrow ``mapInPandas`` on the scan layout — payload bytes
never shuffle; malformed/truncated payloads yield nothing, never a
stage failure):

- ``pdf_object_index``: one row per xref entry (object number,
  generation, byte offset, in-use flag) classified by its top-level
  ``/Type`` (catalog/pages/page) or ``stream`` framing, with the
  direct ``/Length`` on stream rows. Incremental-update sections are
  followed via ``/Prev``; newest section wins per object, the same
  precedence a conforming reader applies.
- ``pdf_page_index``: ordered page list from the Catalog → Pages →
  Kids tree walk (nested ``/Pages`` nodes supported), joined to each
  page's ``/Contents`` stream with the exact byte extent of the
  stream data.
- ``pdf_text_extract``: per-run text with line positions from
  UNCOMPRESSED content streams — a tokenizer over the published text
  operators (``BT``/``Td``/``TD``/``Tj``/``TJ``/``ET``) with full
  PDF literal-string unescaping (named + octal escapes, balanced
  parens, line continuations). Flate-compressed streams are out of
  scope (codec-free contract): they emit nothing, never wrong text.

Untrusted-input discipline (same contract as jpeg.py/video.py after
the r4 ADVICE findings): every count parsed from payload bytes is
bounded against the payload size before any allocation or loop —
xref subsection counts are capped by the remaining bytes / 20, the
``/Prev`` chain is cycle-checked and depth-capped, and the page-tree
recursion is depth- and width-capped.

Reference scope: the reference repo has no PDF path (SURVEY.md §2.8);
this module is part of the beyond-reference multimodal/webtext
mandate — PDFs are a top-5 non-HTML content type in public web crawls
(Common Crawl MIME stats), so the index family would be incomplete
without them.
"""

from __future__ import annotations

import re
import zlib
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
    "parse_pdf_objects",
    "parse_pdf_pages",
    "pdf_object_index",
    "pdf_page_index",
    "parse_pdf_text_runs",
    "pdf_text_extract",
    "synth_pdf",
    "synth_pdf_text",
    "with_synth_pdf",
    "with_synth_pdf_text",
]

_MAX_XREF_SECTIONS = 16
_MAX_TREE_DEPTH = 32
_MAX_KIDS = 4096
_DICT_SCAN_CAP = 4096  # bytes of an object examined for classification

_TYPE_RE = re.compile(rb"/Type\s*/(Catalog|Pages|Page)(?![A-Za-z])")
_STREAM_RE = re.compile(rb"(?<!end)stream\r?\n")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")
_ROOT_RE = re.compile(rb"/Root\s+(\d+)\s+\d+\s+R")
_PREV_RE = re.compile(rb"/Prev\s+(\d+)")
_PAGES_REF_RE = re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R")
_CONTENTS_RE = re.compile(rb"/Contents\s*\[?\s*(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:[^\[\]])*)\]")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_ENTRY_RE = re.compile(rb"(\d{10})\s+(\d{5})\s+([nf])")
_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj")


def _read_xref_chain(data: bytes):
    """Walk the classic-xref chain from ``startxref`` through every
    ``/Prev`` section. Returns ``(entries, root)`` where ``entries``
    maps obj_num -> (offset, gen, in_use) with newest-section
    precedence, or ``None`` when the trailer machinery is absent or
    malformed (not a parseable PDF)."""
    sx = data.rfind(b"startxref")
    if sx < 0:
        return None
    m = re.match(rb"startxref\s+(\d+)", data[sx : sx + 32])
    if not m:
        return None
    xref_off = int(m.group(1))
    entries: dict[int, tuple[int, int, int]] = {}
    root = None
    seen_offsets: set[int] = set()
    for _ in range(_MAX_XREF_SECTIONS):
        if xref_off in seen_offsets or xref_off >= len(data):
            return None
        seen_offsets.add(xref_off)
        if not data.startswith(b"xref", xref_off):
            return None  # xref streams (PDF 1.5 compressed xref) unsupported
        pos = xref_off + 4
        # subsections: "start count" lines until the trailer keyword
        while True:
            m = re.match(rb"\s*(\d+)\s+(\d+)\s", data[pos : pos + 48])
            if not m:
                break
            start, count = int(m.group(1)), int(m.group(2))
            pos += m.end()
            # untrusted count: cap against the bytes actually present
            if count > (len(data) - pos) // 20 + 1:
                return None
            for k in range(count):
                em = _ENTRY_RE.match(data[pos : pos + 20])
                if not em:
                    return None
                num = start + k
                if num not in entries:  # newest section wins
                    entries[num] = (
                        int(em.group(1)),
                        int(em.group(2)),
                        1 if em.group(3) == b"n" else 0,
                    )
                pos += 20
        tpos = data.find(b"trailer", pos)
        if tpos < 0:
            return None
        # bound the trailer window at its own startxref so an appended
        # incremental update's trailer keys can't bleed in
        tend = data.find(b"startxref", tpos)
        if tend < 0 or tend - tpos > 1024:
            tend = tpos + 1024
        tail = data[tpos:tend]
        if root is None:
            rm = _ROOT_RE.search(tail)
            root = int(rm.group(1)) if rm else None
        pm = _PREV_RE.search(tail)
        if pm is None:
            return entries, root
        xref_off = int(pm.group(1))
    return None  # /Prev chain longer than the cap: refuse, don't spin


def _object_region(data: bytes, offset: int):
    """The classification window of the object at ``offset``: the bytes
    from the ``N G obj`` head up to ``endobj`` (stream payloads are
    jumped over via the direct ``/Length``, so payload bytes that spell
    ``endobj`` cannot truncate the region). Returns ``(num, gen,
    region, stream_rel, stream_len)`` or ``None``."""
    if offset < 0 or offset >= len(data):
        return None
    head = _OBJ_HEAD_RE.match(data[offset : offset + 48])
    if not head:
        return None
    cap = data[offset : offset + _DICT_SCAN_CAP]
    sm = _STREAM_RE.search(cap)
    eo = cap.find(b"endobj")
    stream_rel = stream_len = None
    if sm is not None and (eo < 0 or sm.start() < eo):
        # stream object: /Length must sit in THIS object's dict (before
        # the stream keyword), and the payload is jumped, not scanned
        stream_rel = sm.end()
        lm = _LENGTH_RE.search(cap, 0, sm.start())
        if lm is not None:
            stream_len = int(lm.group(1))
            if stream_len > len(data) - offset - stream_rel:
                return None  # declared length beyond the payload
            eo2 = data.find(b"endobj", offset + stream_rel + stream_len)
            if eo2 < 0 or eo2 - (offset + stream_rel + stream_len) > 64:
                return None
            end = eo2
        else:
            eo2 = data.find(b"endobj", offset + stream_rel)
            if eo2 < 0:
                return None
            end = eo2
    else:
        if eo < 0:
            return None  # no endobj inside the scan cap and no stream
        end = offset + eo
    region = data[offset : end + 6]
    return int(head.group(1)), int(head.group(2)), region, stream_rel, stream_len


def parse_pdf_objects(data: bytes):
    """Rows ``(obj_num, gen, offset, in_use, obj_class, stream_len)``
    for every xref entry, sorted by object number. Free entries carry
    class ``'free'``; in-use entries are classified from their
    top-level ``/Type`` or stream framing (``'other'`` when neither).
    Returns ``None`` for anything that is not a classic-xref PDF."""
    if not data.startswith(b"%PDF-"):
        return None
    chain = _read_xref_chain(data)
    if chain is None:
        return None
    entries, _root = chain
    rows = []
    for num in sorted(entries):
        off, gen, in_use = entries[num]
        if not in_use:
            rows.append((num, gen, off, 0, "free", None))
            continue
        reg = _object_region(data, off)
        if reg is None or reg[0] != num:
            return None  # xref points at something that isn't this object
        _num, rgen, region, stream_rel, stream_len = reg
        tm = _TYPE_RE.search(region[: stream_rel or len(region)])
        if tm is not None:
            cls = {b"Catalog": "catalog", b"Pages": "pages", b"Page": "page"}[
                tm.group(1)
            ]
        elif stream_rel is not None:
            cls = "stream"
        else:
            cls = "other"
        rows.append((num, rgen, off, 1, cls, stream_len))
    return rows


def _walk_kids(data: bytes, entries, node: int, out: list[int], depth: int) -> bool:
    """Depth-first Kids walk appending leaf page object numbers in
    document order. False on any structural violation."""
    if depth > _MAX_TREE_DEPTH or len(out) > _MAX_KIDS:
        return False
    ent = entries.get(node)
    if ent is None or not ent[2]:
        return False
    reg = _object_region(data, ent[0])
    if reg is None:
        return False
    region = reg[2]
    tm = _TYPE_RE.search(region)
    if tm is None:
        return False
    if tm.group(1) == b"Page":
        out.append(node)
        return True
    if tm.group(1) != b"Pages":
        return False
    km = _KIDS_RE.search(region)
    if km is None:
        return False
    kids = [int(g) for g in _REF_RE.findall(km.group(1))]
    if len(kids) > _MAX_KIDS:
        return False
    return all(_walk_kids(data, entries, k, out, depth + 1) for k in kids)


def parse_pdf_pages(data: bytes):
    """Rows ``(page_idx, page_obj, content_obj, content_offset,
    stream_off, stream_len)`` in document page order from the
    Catalog → Pages → Kids walk; ``None`` when the tree is absent or
    malformed. ``stream_off``/``stream_len`` delimit the raw content
    stream data — the extent a text extractor range-reads."""
    if not data.startswith(b"%PDF-"):
        return None
    chain = _read_xref_chain(data)
    if chain is None or chain[1] is None:
        return None
    entries, root = chain
    ent = entries.get(root)
    if ent is None or not ent[2]:
        return None
    reg = _object_region(data, ent[0])
    if reg is None:
        return None
    pm = _PAGES_REF_RE.search(reg[2])
    if pm is None:
        return None
    pages: list[int] = []
    if not _walk_kids(data, entries, int(pm.group(1)), pages, 0):
        return None
    rows = []
    for idx, pnum in enumerate(pages):
        preg = _object_region(data, entries[pnum][0])
        if preg is None:
            return None
        cm = _CONTENTS_RE.search(preg[2])
        if cm is None:
            rows.append((idx, pnum, None, None, None, None))
            continue
        cnum = int(cm.group(1))
        cent = entries.get(cnum)
        if cent is None or not cent[2]:
            return None
        creg = _object_region(data, cent[0])
        if creg is None or creg[3] is None:
            return None
        rows.append(
            (idx, pnum, cnum, cent[0], cent[0] + creg[3], creg[4])
        )
    return rows


# ---------------------------------------------------------------------------
# deterministic synthesis (fixed-slot layout => closed-form oracle)
# ---------------------------------------------------------------------------

_SLOT_OBJ = 96  # catalog / pages / page objects
_SLOT_STREAM = 160  # content-stream objects
_HDR = b"%PDF-1.7\n"  # 9 bytes


def synth_pdf_n_pages(doc_id: int) -> int:
    return 1 + doc_id % 3


def synth_pdf_stream_len(doc_id: int, j: int) -> int:
    return 20 + (doc_id * 7 + j * 11) % 40


def synth_pdf(doc_id: int) -> bytes:
    """A structurally valid classic-xref PDF whose object offsets are
    pure formulas: every non-stream object is padded (with a ``%``
    comment, legal inter-object bytes) to a 96-byte slot and every
    content stream to a 160-byte slot, so object k's offset is
    ``9 + Σ slots`` — the closed form the DuckDB oracle replays.
    ``n = 1 + id % 3`` pages, content streams of
    ``20 + (id*7 + j*11) % 40`` filler bytes."""
    n = synth_pdf_n_pages(doc_id)
    n_obj = 2 + 2 * n
    buf = bytearray(_HDR)
    offsets: dict[int, int] = {}

    def emit(num: int, body: bytes, slot: int) -> None:
        offsets[num] = len(buf)
        text = f"{num} 0 obj\n".encode() + body + b"endobj\n"
        pad = slot - len(text)
        assert pad >= 2, (num, len(text), slot)
        buf.extend(text)
        buf.extend(b"%" + b"." * (pad - 2) + b"\n")

    emit(1, b"<< /Type /Catalog /Pages 2 0 R >>\n", _SLOT_OBJ)
    kids = " ".join(f"{3 + j} 0 R" for j in range(n))
    emit(2, f"<< /Type /Pages /Kids [{kids}] /Count {n} >>\n".encode(), _SLOT_OBJ)
    for j in range(n):
        emit(
            3 + j,
            f"<< /Type /Page /Parent 2 0 R /Contents {3 + n + j} 0 R >>\n".encode(),
            _SLOT_OBJ,
        )
    for j in range(n):
        plen = synth_pdf_stream_len(doc_id, j)
        payload = bytes((doc_id * 5 + j * 3 + k) % 255 for k in range(plen))
        emit(
            3 + n + j,
            f"<< /Length {plen} >>\n".encode()
            + b"stream\n"
            + payload
            + b"\nendstream\n",
            _SLOT_STREAM,
        )
    xref_off = len(buf)
    buf += f"xref\n0 {n_obj + 1}\n".encode()
    buf += b"0000000000 65535 f \n"
    for num in range(1, n_obj + 1):
        buf += f"{offsets[num]:010d} 00000 n \n".encode()
    buf += (
        f"trailer\n<< /Size {n_obj + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_off}\n%%EOF\n"
    ).encode()
    return bytes(buf)


def with_synth_pdf(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture stage: deterministic PDF per id (see ``synth_pdf``)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def _synth(ids: pd.Series) -> pd.Series:
        return pd.Series([synth_pdf(int(i)) for i in ids])

    return df.withColumn("data", _synth(F.col(id_col)))


# ---------------------------------------------------------------------------
# Spark stages
# ---------------------------------------------------------------------------

_OBJECT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("obj_num", IntegerType(), False),
        StructField("gen", IntegerType(), False),
        StructField("offset", LongType(), False),
        StructField("in_use", IntegerType(), False),
        StructField("obj_class", StringType(), False),
        StructField("stream_len", IntegerType(), True),
    ]
)


def pdf_object_index(
    df: DataFrame, data_col: str = "data", id_col: str = "doc_id"
) -> DataFrame:
    """One row per xref entry with byte offset, in-use flag, and the
    object's structural class. One Arrow pass on the scan layout;
    non-PDF payloads emit nothing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for d, v in zip(b[id_col], b[data_col]):
                objs = parse_pdf_objects(bytes(v)) if v is not None else None
                for num, gen, off, used, cls, slen in objs or ():
                    rows.append((int(d), num, gen, off, used, cls, slen))
            yield pd.DataFrame.from_records(
                rows, columns=[f.name for f in _OBJECT_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=_OBJECT_SCHEMA)


_PAGE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("page_idx", IntegerType(), False),
        StructField("page_obj", IntegerType(), False),
        StructField("content_obj", IntegerType(), True),
        StructField("content_offset", LongType(), True),
        StructField("stream_off", LongType(), True),
        StructField("stream_len", IntegerType(), True),
    ]
)


def pdf_page_index(
    df: DataFrame, data_col: str = "data", id_col: str = "doc_id"
) -> DataFrame:
    """Ordered pages from the Catalog → Pages → Kids walk with each
    page's content-stream byte extent. One Arrow pass; documents
    without a parseable page tree emit nothing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for d, v in zip(b[id_col], b[data_col]):
                pages = parse_pdf_pages(bytes(v)) if v is not None else None
                for idx, pobj, cobj, coff, soff, slen in pages or ():
                    rows.append((int(d), idx, pobj, cobj, coff, soff, slen))
            yield pd.DataFrame.from_records(
                rows, columns=[f.name for f in _PAGE_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=_PAGE_SCHEMA)


# ---------------------------------------------------------------------------
# text extraction from uncompressed content streams (Tj / TJ / Td walk)
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    rb"(?P<num>[+-]?\d+(?:\.\d+)?|[+-]?\.\d+)"
    rb"|(?P<name>/[^\s()<>\[\]{}/%]*)"
    rb"|(?P<op>[A-Za-z']{1,3}\*?)"
    rb"|(?P<other>\S)"
)

_ESC_MAP = {
    0x6E: b"\n", 0x72: b"\r", 0x74: b"\t", 0x62: b"\b", 0x66: b"\f",
    0x28: b"(", 0x29: b")", 0x5C: b"\\",
}


def _pdf_literal_string(content: bytes, i: int):
    """Decode a PDF literal string starting at ``content[i] == '('``:
    balanced parens, backslash escapes (named, octal up to 3 digits,
    line continuations). Returns ``(bytes, next_index)`` or ``None``
    when unterminated."""
    assert content[i : i + 1] == b"("
    depth, out, i = 1, bytearray(), i + 1
    n = len(content)
    while i < n:
        c = content[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                return None
            e = content[i]
            if e in _ESC_MAP:
                out += _ESC_MAP[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                val, k = 0, 0
                while k < 3 and i < n and 0x30 <= content[i] <= 0x37:
                    val = val * 8 + (content[i] - 0x30)
                    i += 1
                    k += 1
                out.append(val & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and content[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the backslash is dropped (spec)
                out.append(e)
                i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return None  # unterminated


def _text_runs(content: bytes):
    """Walk one uncompressed content stream, emitting ``(x, y, text)``
    per shown string: ``BT`` resets the line cursor, ``Td``/``TD``
    translate it, ``Tj`` shows a string, ``TJ`` shows an array whose
    string parts concatenate (kerning numbers ignored). Graphics and
    font operators are skipped; hex strings and compressed streams are
    out of scope (emit nothing rather than wrong text)."""
    runs = []
    stack: list[float] = []
    x = y = 0.0
    last_string: bytes | None = None
    in_tj_array = False
    tj_parts: list[bytes] = []
    i, n = 0, len(content)
    while i < n:
        c = content[i : i + 1]
        if c.isspace():
            i += 1
            continue
        if c == b"(":
            s = _pdf_literal_string(content, i)
            if s is None:
                return None
            if in_tj_array:
                tj_parts.append(s[0])
            else:
                last_string = s[0]  # Tj consumes the pending literal
            i = s[1]
            continue
        if c == b"[":
            in_tj_array = True
            tj_parts = []
            i += 1
            continue
        if c == b"]":
            in_tj_array = False
            i += 1
            continue
        m = _TOKEN_RE.match(content, i)
        if m is None:
            return None
        i = m.end()
        if m.lastgroup == "num":
            if not in_tj_array:
                stack.append(float(m.group()))
            continue
        if m.lastgroup == "name":
            continue
        op = m.group()
        if op == b"BT":
            x = y = 0.0
        elif op in (b"Td", b"TD") and len(stack) >= 2:
            x += stack[-2]
            y += stack[-1]
        elif op == b"Tj":
            if last_string is None:
                return None  # Tj with no string operand: malformed
            runs.append((x, y, last_string))
        elif op == b"TJ":
            runs.append((x, y, b"".join(tj_parts)))
            tj_parts = []
        stack.clear()  # every operator consumes its operands
        last_string = None if op in (b"Tj", b"TJ") else last_string
    return runs


_FLATE_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode")
_MAX_INFLATE = 1 << 22  # 4 MiB inflated per stream — bomb guard


def _content_bytes(data: bytes, coff, soff: int, slen: int):
    """The decoded bytes of one content stream: raw when unfiltered,
    inflated via stdlib zlib when the stream dict declares
    ``/FlateDecode`` — capped at ``_MAX_INFLATE`` so a small
    compression bomb can't balloon into executor memory (same
    discipline as the PNG IDAT guard in rawmedia.py). ``None`` for
    corrupt deflate data, over-cap inflation, or other filters."""
    raw = data[soff : soff + slen]
    if coff is not None:
        reg = _object_region(data, coff)
        if reg is not None and reg[3] is not None and _FLATE_RE.search(
            reg[2][: reg[3]]
        ):
            try:
                dec = zlib.decompressobj()
                out = dec.decompress(raw, _MAX_INFLATE)
            except zlib.error:
                return None
            if dec.unconsumed_tail or not dec.eof:
                # past the cap (bomb) or truncated/garbage-tailed
                # deflate data: refuse, don't OOM or emit partial text
                return None
            return out
    return raw


_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[((?:[^\[\]])*)\]")


def _content_refs(region: bytes) -> list[int]:
    """All /Contents stream object numbers of a page — the array form
    ``/Contents [a 0 R b 0 R]`` (ISO 32000 §7.7.3.3: the streams
    concatenate into ONE content stream) or the single-ref form."""
    m = _CONTENTS_ARR_RE.search(region)
    if m is not None:
        return [int(g) for g in _REF_RE.findall(m.group(1))]
    m = _CONTENTS_RE.search(region)
    return [int(m.group(1))] if m is not None else []


def parse_pdf_text_runs(data: bytes):
    """Rows ``(page_idx, run_idx, x, y, text)`` across the document's
    pages in order — text decoded from raw or FlateDecode content
    streams (stdlib zlib, inflation-capped); /Contents ARRAYS are
    concatenated per the spec before tokenizing, so a text object
    split across streams still decodes. Other filters and hex strings
    are out of scope and emit nothing rather than wrong text. ``None``
    when the page tree is unparseable."""
    if not data.startswith(b"%PDF-"):
        return None
    chain = _read_xref_chain(data)
    if chain is None or chain[1] is None:
        return None
    entries, root = chain
    ent = entries.get(root)
    if ent is None or not ent[2]:
        return None
    reg = _object_region(data, ent[0])
    if reg is None:
        return None
    pm = _PAGES_REF_RE.search(reg[2])
    if pm is None:
        return None
    pages: list[int] = []
    if not _walk_kids(data, entries, int(pm.group(1)), pages, 0):
        return None
    out = []
    for idx, pnum in enumerate(pages):
        preg = _object_region(data, entries[pnum][0])
        if preg is None:
            return None
        parts = []
        for cnum in _content_refs(preg[2]):
            cent = entries.get(cnum)
            if cent is None or not cent[2]:
                parts = None
                break
            creg = _object_region(data, cent[0])
            if creg is None or creg[3] is None or creg[4] is None:
                parts = None
                break
            piece = _content_bytes(
                data, cent[0], cent[0] + creg[3], creg[4]
            )
            if piece is None:
                parts = None
                break
            parts.append(piece)
        if not parts:
            continue  # no/undecodable contents: page emits nothing
        # §7.7.3.3: array elements join with whitespace between tokens
        runs = _text_runs(b"\n".join(parts))
        if runs is None:
            continue
        for ri, (rx, ry, text) in enumerate(runs):
            out.append((idx, ri, int(rx), int(ry), text.decode("latin-1")))
    return out


def synth_pdf_text_n_lines(doc_id: int, page_j: int) -> int:
    return 2 + (doc_id + page_j) % 3


def synth_pdf_text(doc_id: int) -> bytes:
    """A classic-xref PDF (same object layout discipline as
    ``synth_pdf`` but unpadded — this fixture's oracle never reads
    offsets) whose content streams are REAL uncompressed text
    operators: page j shows ``2 + (id+j) % 3`` lines ``doc D page J
    line K`` at x=72, y=708-14*K via an initial ``72 708 Td`` and
    ``0 -14 Td`` line advances."""
    n = synth_pdf_n_pages(doc_id)
    n_obj = 2 + 2 * n
    buf = bytearray(_HDR)
    offsets: dict[int, int] = {}

    def emit(num: int, body: bytes) -> None:
        offsets[num] = len(buf)
        buf.extend(f"{num} 0 obj\n".encode() + body + b"endobj\n")

    emit(1, b"<< /Type /Catalog /Pages 2 0 R >>\n")
    kids = " ".join(f"{3 + j} 0 R" for j in range(n))
    emit(2, f"<< /Type /Pages /Kids [{kids}] /Count {n} >>\n".encode())
    for j in range(n):
        emit(
            3 + j,
            f"<< /Type /Page /Parent 2 0 R /Contents {3 + n + j} 0 R >>\n".encode(),
        )
    for j in range(n):
        lines = [b"BT /F1 12 Tf"]
        for k in range(synth_pdf_text_n_lines(doc_id, j)):
            td = b"72 708 Td" if k == 0 else b"0 -14 Td"
            lines.append(td + f" (doc {doc_id} page {j} line {k}) Tj".encode())
        lines.append(b"ET")
        content = b"\n".join(lines) + b"\n"
        emit(
            3 + n + j,
            f"<< /Length {len(content)} >>\n".encode()
            + b"stream\n"
            + content
            + b"\nendstream\n",
        )
    xref_off = len(buf)
    buf += f"xref\n0 {n_obj + 1}\n".encode()
    buf += b"0000000000 65535 f \n"
    for num in range(1, n_obj + 1):
        buf += f"{offsets[num]:010d} 00000 n \n".encode()
    buf += (
        f"trailer\n<< /Size {n_obj + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_off}\n%%EOF\n"
    ).encode()
    return bytes(buf)


def with_synth_pdf_text(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture stage: text-bearing PDF per id (see ``synth_pdf_text``)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def _synth(ids: pd.Series) -> pd.Series:
        return pd.Series([synth_pdf_text(int(i)) for i in ids])

    return df.withColumn("data", _synth(F.col(id_col)))


_TEXT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("page_idx", IntegerType(), False),
        StructField("run_idx", IntegerType(), False),
        StructField("x", IntegerType(), False),
        StructField("y", IntegerType(), False),
        StructField("text", StringType(), False),
    ]
)


def pdf_text_extract(
    df: DataFrame, data_col: str = "data", id_col: str = "doc_id"
) -> DataFrame:
    """Per-run text from every page's uncompressed content stream, in
    document order with line positions — distributed PDF → training
    text. One Arrow pass; undecodable documents emit nothing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for d, v in zip(b[id_col], b[data_col]):
                runs = parse_pdf_text_runs(bytes(v)) if v is not None else None
                for idx, ri, rx, ry, text in runs or ():
                    rows.append((int(d), idx, ri, rx, ry, text))
            yield pd.DataFrame.from_records(
                rows, columns=[f.name for f in _TEXT_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=_TEXT_SCHEMA)
