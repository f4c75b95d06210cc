"""ZIP archive index + DOCX text extraction — REAL end-of-central-
directory walk, codec-free for structure, stdlib zlib for deflate
(APPNOTE.TXT / ISO 21320-1, the published PKZIP byte layout).

ZIP is the container format of a large share of non-HTML crawl
payloads: DOCX/XLSX/PPTX (OOXML), EPUB, JAR, APK. The archive
STRUCTURE needs no codec: the end-of-central-directory record
(``PK\\x05\\x06``, found by a bounded backward scan past an optional
archive comment), the 46-byte central-directory file headers
(``PK\\x01\\x02``), and the 30-byte local headers (``PK\\x03\\x04``)
give every member's exact compressed byte extent — the range read a
100 TB pipeline fans out before any inflation happens. Member
DECOMPRESSION uses stdlib zlib (raw deflate) with a declared-size cap,
so a crafted ratio bomb cannot balloon into executor memory.

Operators (Arrow ``mapInPandas`` on the scan layout — payload bytes
never shuffle; malformed/truncated archives yield nothing, never a
stage failure):

- ``zip_entry_index``: one row per central-directory entry with name,
  method, compressed/uncompressed sizes, and the exact local-header +
  member-data byte offsets (local header cross-verified against the
  central directory).
- ``docx_text_extract``: WordprocessingML text — locate the
  ``word/document.xml`` member, extract it (stored or deflate), and
  emit one row per ``<w:p>`` paragraph with its ``<w:t>`` runs
  concatenated and XML-unescaped. The Office-document analogue of
  pdf_text_extract.

Untrusted-input discipline (the r4 ADVICE contract): the EOCD entry
count is bounded by the central-directory size / 46 and by a hard
65535 cap before any loop; name/extra/comment lengths are bounded
against the remaining bytes; inflation is capped at the declared
uncompressed size (+1 sentinel) and a corrupt or lying stream yields
``None``, never partial text.

Reference scope: the reference repo has no archive path (SURVEY.md
§2.8); this module is part of the beyond-reference multimodal/webtext
mandate alongside pdf.py.
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
    "parse_zip_entries",
    "zip_entry_index",
    "extract_zip_member",
    "parse_docx_paragraphs",
    "docx_text_extract",
    "synth_zip",
    "with_synth_zip",
    "synth_docx",
    "with_synth_docx",
    "parse_epub_chapters",
    "epub_text_extract",
    "synth_epub",
    "with_synth_epub",
    "parse_xlsx_cells",
    "xlsx_text_extract",
    "synth_xlsx",
    "with_synth_xlsx",
]

_EOCD_SIG = b"PK\x05\x06"
_CDH_SIG = b"PK\x01\x02"
_LFH_SIG = b"PK\x03\x04"
_MAX_ENTRIES = 65535
_MAX_INFLATE_HEADROOM = 1  # inflate cap = declared usize + this sentinel


def _find_eocd(data: bytes):
    """The EOCD record: a bounded backward scan over the last
    65557 bytes (22-byte record + max 65535-byte archive comment).
    Returns (n_entries, cd_size, cd_offset) or None."""
    n = len(data)
    if n < 22:
        return None
    start = max(0, n - 22 - 65535)
    pos = data.rfind(_EOCD_SIG, start)
    if pos < 0 or pos + 22 > n:
        return None
    total = int.from_bytes(data[pos + 10 : pos + 12], "little")
    cd_size = int.from_bytes(data[pos + 12 : pos + 16], "little")
    cd_off = int.from_bytes(data[pos + 16 : pos + 20], "little")
    # untrusted counts: the directory must really fit, and 46 bytes is
    # the minimum central header, so total > cd_size//46 is a lie
    if cd_off + cd_size > pos or total > _MAX_ENTRIES or total > cd_size // 46 + 1:
        return None
    return total, cd_size, cd_off


def parse_zip_entries(data: bytes):
    """Rows ``(entry_idx, name, method, comp_len, uncomp_len, crc32,
    header_off, data_off)`` for every central-directory entry, in
    directory order; ``None`` when the archive structure is absent or
    inconsistent (truncated directory, local header mismatch)."""
    eocd = _find_eocd(data)
    if eocd is None:
        return None
    total, cd_size, cd_off = eocd
    rows = []
    pos = cd_off
    end = cd_off + cd_size
    for idx in range(total):
        if pos + 46 > end or data[pos : pos + 4] != _CDH_SIG:
            return None
        method = int.from_bytes(data[pos + 10 : pos + 12], "little")
        crc = int.from_bytes(data[pos + 16 : pos + 20], "little")
        csize = int.from_bytes(data[pos + 20 : pos + 24], "little")
        usize = int.from_bytes(data[pos + 24 : pos + 28], "little")
        nlen = int.from_bytes(data[pos + 28 : pos + 30], "little")
        elen = int.from_bytes(data[pos + 30 : pos + 32], "little")
        clen = int.from_bytes(data[pos + 32 : pos + 34], "little")
        lfh = int.from_bytes(data[pos + 42 : pos + 46], "little")
        if pos + 46 + nlen + elen + clen > end:
            return None
        name = data[pos + 46 : pos + 46 + nlen]
        # cross-check the local header the central entry points at
        if lfh + 30 > len(data) or data[lfh : lfh + 4] != _LFH_SIG:
            return None
        l_nlen = int.from_bytes(data[lfh + 26 : lfh + 28], "little")
        l_elen = int.from_bytes(data[lfh + 28 : lfh + 30], "little")
        data_off = lfh + 30 + l_nlen + l_elen
        if data_off + csize > len(data):
            return None  # member extent beyond the payload
        rows.append(
            (
                idx,
                name.decode("utf-8", "replace"),
                method,
                csize,
                usize,
                crc,
                lfh,
                data_off,
            )
        )
        pos += 46 + nlen + elen + clen
    return rows


def extract_zip_member(data: bytes, member: str):
    """The decompressed bytes of one member by exact name — stored
    (method 0) or deflate (method 8, stdlib zlib raw-deflate window)
    with inflation capped at the declared uncompressed size; ``None``
    for other methods, CRC mismatch, corrupt/lying streams, or a
    missing member."""
    entries = parse_zip_entries(data)
    if entries is None:
        return None
    for _i, name, method, csize, usize, crc, _lfh, doff in entries:
        if name != member:
            continue
        raw = data[doff : doff + csize]
        if method == 0:
            out = raw
        elif method == 8:
            try:
                dec = zlib.decompressobj(-15)
                out = dec.decompress(raw, usize + _MAX_INFLATE_HEADROOM)
            except zlib.error:
                return None
            if dec.unconsumed_tail or len(out) != usize:
                return None  # ratio bomb past the declared size, or short
        else:
            return None
        if zlib.crc32(out) != crc:
            return None
        return out
    return None


_WP_RE = re.compile(rb"<w:p[ >].*?</w:p>|<w:p/>", re.S)
_WT_RE = re.compile(rb"<w:t(?:\s[^>]*)?>(.*?)</w:t>", re.S)
_XML_UNESC = {
    # &amp; LAST, or "&amp;lt;" would double-unescape into "<"
    b"&lt;": b"<", b"&gt;": b">",
    b"&quot;": b'"', b"&apos;": b"'", b"&amp;": b"&",
}


def _xml_unescape(s: bytes) -> bytes:
    for k, v in _XML_UNESC.items():
        s = s.replace(k, v)
    return s


def parse_docx_paragraphs(data: bytes):
    """Rows ``(para_idx, text)`` from ``word/document.xml`` —
    ``<w:t>`` runs concatenated per ``<w:p>`` paragraph, XML entities
    unescaped; empty paragraphs kept (they are document structure).
    ``None`` when the archive or the member is unreadable."""
    xml = extract_zip_member(data, "word/document.xml")
    if xml is None:
        return None
    out = []
    for idx, pm in enumerate(_WP_RE.finditer(xml)):
        runs = _WT_RE.findall(pm.group())
        out.append(
            (idx, _xml_unescape(b"".join(runs)).decode("utf-8", "replace"))
        )
    return out


# ---------------------------------------------------------------------------
# deterministic synthesis
# ---------------------------------------------------------------------------


def synth_zip_n_members(doc_id: int) -> int:
    return 2 + doc_id % 4


def synth_zip_payload_len(doc_id: int, i: int) -> int:
    return 10 + (doc_id * 3 + i * 7) % 30


def _member_payload(doc_id: int, i: int) -> bytes:
    plen = synth_zip_payload_len(doc_id, i)
    return bytes(0x20 + (doc_id * 5 + i * 3 + k) % 90 for k in range(plen))


def _zip_build(members: list[tuple[bytes, int, bytes, bytes]]) -> bytes:
    """Assemble a ZIP from (name, method, stored_bytes, usize+crc
    source bytes) tuples — shared by both synth fixtures."""
    buf = bytearray()
    central = bytearray()
    for name, method, blob, plain in members:
        lfh = len(buf)
        crc = zlib.crc32(plain)
        buf += (
            _LFH_SIG
            + b"\x14\x00\x00\x00"
            + method.to_bytes(2, "little")
            + b"\x00\x00\x00\x00"  # dos time/date (fixed: determinism)
            + crc.to_bytes(4, "little")
            + len(blob).to_bytes(4, "little")
            + len(plain).to_bytes(4, "little")
            + len(name).to_bytes(2, "little")
            + b"\x00\x00"
            + name
        )
        buf += blob
        central += (
            _CDH_SIG
            + b"\x14\x00\x14\x00\x00\x00"
            + method.to_bytes(2, "little")
            + b"\x00\x00\x00\x00"
            + crc.to_bytes(4, "little")
            + len(blob).to_bytes(4, "little")
            + len(plain).to_bytes(4, "little")
            + len(name).to_bytes(2, "little")
            + b"\x00\x00" * 3  # extra/comment/disk
            + b"\x00\x00"  # internal attrs
            + b"\x00\x00\x00\x00"  # external attrs
            + lfh.to_bytes(4, "little")
            + name
        )
    cd_off = len(buf)
    buf += central
    n = len(members)
    buf += (
        _EOCD_SIG
        + b"\x00\x00\x00\x00"
        + n.to_bytes(2, "little") * 2
        + len(central).to_bytes(4, "little")
        + cd_off.to_bytes(4, "little")
        + b"\x00\x00"
    )
    return bytes(buf)


def synth_zip(doc_id: int) -> bytes:
    """A stored-member ZIP whose layout is pure formulas: ``n = 2 +
    id % 4`` members named ``f{i}.txt`` (6-byte names, i single-digit)
    with ``10 + (id*3 + i*7) % 30`` payload bytes each, so local
    header ``i`` sits at ``Σ_{j<i} (36 + plen_j)`` and member data 36
    bytes further — the closed form the DuckDB oracle replays."""
    n = synth_zip_n_members(doc_id)
    members = []
    for i in range(n):
        p = _member_payload(doc_id, i)
        members.append((f"f{i}.txt".encode(), 0, p, p))
    return _zip_build(members)


def synth_docx_n_paras(doc_id: int) -> int:
    return 2 + doc_id % 3


def synth_docx(doc_id: int) -> bytes:
    """A minimal deterministic DOCX: ``[Content_Types].xml`` stored
    plus a DEFLATED ``word/document.xml`` whose body is ``2 + id % 3``
    paragraphs of two ``<w:t>`` runs each (``doc D para K`` + ``
    run 1``) — the text the oracle replays; deflate is re-inflated by
    the engine through the capped zlib path."""
    paras = []
    for k in range(synth_docx_n_paras(doc_id)):
        paras.append(
            f"<w:p ><w:r><w:t>doc {doc_id} para {k}</w:t></w:r>"
            f"<w:r><w:t xml:space=\"preserve\"> run 1</w:t></w:r></w:p>".encode()
        )
    xml = (
        b'<?xml version="1.0"?><w:document><w:body>'
        + b"".join(paras)
        + b"</w:body></w:document>"
    )
    comp = zlib.compressobj(6, zlib.DEFLATED, -15)
    deflated = comp.compress(xml) + comp.flush()
    ct = b'<?xml version="1.0"?><Types/>'
    return _zip_build(
        [
            (b"[Content_Types].xml", 0, ct, ct),
            (b"word/document.xml", 8, deflated, xml),
        ]
    )


def with_synth_zip(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def _synth(ids: pd.Series) -> pd.Series:
        return pd.Series([synth_zip(int(i)) for i in ids])

    return df.withColumn("data", _synth(F.col(id_col)))


def with_synth_docx(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def _synth(ids: pd.Series) -> pd.Series:
        return pd.Series([synth_docx(int(i)) for i in ids])

    return df.withColumn("data", _synth(F.col(id_col)))


# ---------------------------------------------------------------------------
# Spark stages
# ---------------------------------------------------------------------------

_ENTRY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("entry_idx", IntegerType(), False),
        StructField("name", StringType(), False),
        StructField("method", IntegerType(), False),
        StructField("comp_len", LongType(), False),
        StructField("uncomp_len", LongType(), False),
        StructField("crc32", LongType(), False),
        StructField("header_off", LongType(), False),
        StructField("data_off", LongType(), False),
    ]
)


def zip_entry_index(
    df: DataFrame, data_col: str = "data", id_col: str = "doc_id"
) -> DataFrame:
    """One row per central-directory entry with the member's exact
    byte extents. One Arrow pass; non-ZIP payloads emit nothing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for d, v in zip(b[id_col], b[data_col]):
                ents = parse_zip_entries(bytes(v)) if v is not None else None
                for i, nm, me, cs, us, crc, lfh, doff in ents or ():
                    rows.append((int(d), i, nm, me, cs, us, crc, lfh, doff))
            yield pd.DataFrame.from_records(
                rows, columns=[f.name for f in _ENTRY_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=_ENTRY_SCHEMA)


_DOCX_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("para_idx", IntegerType(), False),
        StructField("text", StringType(), False),
    ]
)


def docx_text_extract(
    df: DataFrame, data_col: str = "data", id_col: str = "doc_id"
) -> DataFrame:
    """One row per WordprocessingML paragraph — distributed DOCX →
    training text. One Arrow pass; unreadable archives emit nothing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for d, v in zip(b[id_col], b[data_col]):
                paras = parse_docx_paragraphs(bytes(v)) if v is not None else None
                for idx, text in paras or ():
                    rows.append((int(d), idx, text))
            yield pd.DataFrame.from_records(
                rows, columns=[f.name for f in _DOCX_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=_DOCX_SCHEMA)


# ---------------------------------------------------------------------------
# EPUB chapter text (OCF container -> OPF spine -> XHTML tag strip)
# ---------------------------------------------------------------------------

_FULLPATH_RE = re.compile(rb'full-path="([^"]+)"')
_ITEM_RE = re.compile(rb"<item\s[^>]*>")
_ATTR_ID_RE = re.compile(rb'\bid="([^"]+)"')
_ATTR_HREF_RE = re.compile(rb'\bhref="([^"]+)"')
_ITEMREF_RE = re.compile(rb'<itemref\s[^>]*\bidref="([^"]+)"')
_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(rb"\s+")


def parse_epub_chapters(data: bytes):
    """Rows ``(spine_idx, href, text)`` in READING ORDER — the OCF
    walk a distributed ebook → text pipeline runs: META-INF/
    container.xml names the OPF package, the OPF manifest maps ids to
    hrefs, and the SPINE (not manifest order) gives the chapter
    sequence (EPUB OCF/Packages 3.3, idpf.org). Chapter XHTML is
    extracted through the capped-deflate path, tag-stripped,
    entity-unescaped, and whitespace-collapsed. Non-spine manifest
    items (covers, fonts, styles) never surface. ``None`` when the
    container chain is unreadable."""
    cx = extract_zip_member(data, "META-INF/container.xml")
    if cx is None:
        return None
    fm = _FULLPATH_RE.search(cx)
    if fm is None:
        return None
    opf_path = fm.group(1).decode("utf-8", "replace")
    opf = extract_zip_member(data, opf_path)
    if opf is None:
        return None
    opf_dir = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
    manifest: dict[bytes, bytes] = {}
    for tag in _ITEM_RE.findall(opf):
        im = _ATTR_ID_RE.search(tag)
        hm = _ATTR_HREF_RE.search(tag)
        if im is not None and hm is not None:
            manifest[im.group(1)] = hm.group(1)
    rows = []
    for idx, idref in enumerate(_ITEMREF_RE.findall(opf)):
        href = manifest.get(idref)
        if href is None:
            return None  # spine points outside the manifest
        member = opf_dir + href.decode("utf-8", "replace")
        xhtml = extract_zip_member(data, member)
        if xhtml is None:
            return None
        text = _WS_RE.sub(b" ", _TAG_RE.sub(b" ", xhtml)).strip()
        rows.append(
            (idx, member, _xml_unescape(text).decode("utf-8", "replace"))
        )
    return rows


def synth_epub_n_chapters(doc_id: int) -> int:
    return 1 + doc_id % 3


def synth_epub(doc_id: int) -> bytes:
    """A minimal deterministic EPUB: stored mimetype + container.xml,
    a deflated OPF whose spine lists ``1 + id % 3`` chapters in
    REVERSE manifest order (so honoring the spine is observable), a
    non-spine decoy item, and deflated XHTML chapters whose stripped
    text is ``doc D ch I heading doc D ch I para &`` per chapter."""
    n = synth_epub_n_chapters(doc_id)
    mime = b"application/epub+zip"
    container = (
        b'<?xml version="1.0"?><container version="1.0"><rootfiles>'
        b'<rootfile full-path="OEBPS/content.opf" '
        b'media-type="application/oebps-package+xml"/>'
        b"</rootfiles></container>"
    )
    items = [
        f'<item id="c{i}" href="ch{i}.xhtml" media-type="application/xhtml+xml"/>'
        for i in range(n)
    ]
    items.append('<item id="cover" href="cover.png" media-type="image/png"/>')
    spine = [f'<itemref idref="c{i}"/>' for i in reversed(range(n))]
    opf = (
        '<?xml version="1.0"?><package version="3.0"><manifest>'
        + "".join(items)
        + "</manifest><spine>"
        + "".join(spine)
        + "</spine></package>"
    ).encode()
    members: list[tuple[bytes, int, bytes, bytes]] = [
        (b"mimetype", 0, mime, mime),
        (b"META-INF/container.xml", 0, container, container),
    ]

    def _deflate(plain: bytes) -> tuple[int, bytes]:
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        return 8, c.compress(plain) + c.flush()

    m, blob = _deflate(opf)
    members.append((b"OEBPS/content.opf", m, blob, opf))
    for i in range(n):
        xhtml = (
            f"<html><body><h1>doc {doc_id} ch {i} heading</h1>"
            f"<p>doc {doc_id} ch {i} para &amp;</p></body></html>"
        ).encode()
        m, blob = _deflate(xhtml)
        members.append((f"OEBPS/ch{i}.xhtml".encode(), m, blob, xhtml))
    cover = bytes(16)
    members.append((b"OEBPS/cover.png", 0, cover, cover))
    return _zip_build(members)


def with_synth_epub(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def _synth(ids: pd.Series) -> pd.Series:
        return pd.Series([synth_epub(int(i)) for i in ids])

    return df.withColumn("data", _synth(F.col(id_col)))


_EPUB_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("spine_idx", IntegerType(), False),
        StructField("href", StringType(), False),
        StructField("text", StringType(), False),
    ]
)


def epub_text_extract(
    df: DataFrame, data_col: str = "data", id_col: str = "doc_id"
) -> DataFrame:
    """One row per spine chapter in reading order — distributed
    EPUB → training text. One Arrow pass; unreadable books emit
    nothing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for d, v in zip(b[id_col], b[data_col]):
                chs = parse_epub_chapters(bytes(v)) if v is not None else None
                for idx, href, text in chs or ():
                    rows.append((int(d), idx, href, text))
            yield pd.DataFrame.from_records(
                rows, columns=[f.name for f in _EPUB_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=_EPUB_SCHEMA)


# ---------------------------------------------------------------------------
# XLSX cell text (SpreadsheetML: shared strings + sheet cell walk)
# ---------------------------------------------------------------------------

_SI_RE = re.compile(rb"<si>(.*?)</si>", re.S)
_T_RE = re.compile(rb"<t(?:\s[^>]*)?>(.*?)</t>", re.S)
_CELL_RE = re.compile(rb'<c\s([^>]*?)(?:/>|>(.*?)</c>)', re.S)
_ATTR_R_RE = re.compile(rb'\br="([A-Z]+\d+)"')
_ATTR_T_RE = re.compile(rb'\bt="([^"]+)"')
_V_RE = re.compile(rb"<v>(.*?)</v>", re.S)


def _a1_to_rc(ref: bytes):
    """A1-style cell reference -> 0-based (row, col)."""
    i = 0
    while i < len(ref) and 65 <= ref[i] <= 90:
        i += 1
    if i == 0 or i == len(ref):
        return None
    col = 0
    for k in range(i):
        col = col * 26 + (ref[k] - 64)
    try:
        row = int(ref[i:])
    except ValueError:
        return None
    if row < 1:
        return None
    return row - 1, col - 1


def parse_xlsx_cells(data: bytes):
    """Rows ``(cell_ref, row_idx, col_idx, kind, text)`` from
    ``xl/worksheets/sheet1.xml`` — SpreadsheetML's split layout
    resolved: ``t="s"`` cells point into ``xl/sharedStrings.xml``
    (``<si>`` items, ``<r>`` runs concatenated), ``t="inlineStr"``
    carries its ``<is><t>``, everything else is the literal ``<v>``
    (numeric kind). ``None`` when the archive or sheet is unreadable;
    a shared-string index out of range refuses the document rather
    than emitting wrong text."""
    sheet = extract_zip_member(data, "xl/worksheets/sheet1.xml")
    if sheet is None:
        return None
    shared: list[bytes] = []
    ss = extract_zip_member(data, "xl/sharedStrings.xml")
    if ss is not None:
        for si in _SI_RE.findall(ss):
            shared.append(b"".join(_T_RE.findall(si)))
    rows = []
    for m in _CELL_RE.finditer(sheet):
        attrs, body = m.group(1), m.group(2) or b""
        rm = _ATTR_R_RE.search(attrs)
        if rm is None:
            return None  # r-less cells would mis-place data: refuse
        rc = _a1_to_rc(rm.group(1))
        if rc is None:
            return None
        tm = _ATTR_T_RE.search(attrs)
        kind = tm.group(1).decode() if tm is not None else "n"
        if kind == "s":
            vm = _V_RE.search(body)
            if vm is None:
                return None
            try:
                idx = int(vm.group(1))
            except ValueError:
                return None
            if not 0 <= idx < len(shared):
                return None  # dangling shared-string pointer
            text = shared[idx]
        elif kind == "inlineStr":
            text = b"".join(_T_RE.findall(body))
        else:
            vm = _V_RE.search(body)
            if vm is None:
                continue  # empty styled cell: nothing to emit
            text = vm.group(1)
        rows.append(
            (
                rm.group(1).decode(),
                rc[0],
                rc[1],
                kind,
                _xml_unescape(text).decode("utf-8", "replace"),
            )
        )
    return rows


def synth_xlsx_n_rows(doc_id: int) -> int:
    return 2 + doc_id % 3


def synth_xlsx(doc_id: int) -> bytes:
    """A minimal deterministic XLSX: deflated sharedStrings with one
    ``<si>`` per sheet row (text ``doc D r R``, the last one split
    into two ``<r>`` runs), and a deflated sheet1 whose column A cells
    are ``t="s"`` pointers and column B cells numeric ``10*id + r``."""
    n = synth_xlsx_n_rows(doc_id)
    sis = []
    for r in range(n):
        body = f"doc {doc_id} r {r}"
        if r == n - 1:  # exercise run concatenation
            sis.append(
                f"<si><r><t>{body[: len(body) // 2]}</t></r>"
                f"<r><t xml:space=\"preserve\">{body[len(body) // 2 :]}</t></r></si>"
            )
        else:
            sis.append(f"<si><t>{body}</t></si>")
    ss = (
        '<?xml version="1.0"?><sst count="%d">%s</sst>' % (n, "".join(sis))
    ).encode()
    cells = []
    for r in range(n):
        cells.append(f'<row r="{r + 1}"><c r="A{r + 1}" t="s"><v>{r}</v></c>'
                     f'<c r="B{r + 1}"><v>{10 * doc_id + r}</v></c></row>')
    sheet = (
        '<?xml version="1.0"?><worksheet><sheetData>%s</sheetData></worksheet>'
        % "".join(cells)
    ).encode()

    def _deflate(plain: bytes):
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        return c.compress(plain) + c.flush()

    ct = b'<?xml version="1.0"?><Types/>'
    return _zip_build(
        [
            (b"[Content_Types].xml", 0, ct, ct),
            (b"xl/sharedStrings.xml", 8, _deflate(ss), ss),
            (b"xl/worksheets/sheet1.xml", 8, _deflate(sheet), sheet),
        ]
    )


def with_synth_xlsx(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def _synth(ids: pd.Series) -> pd.Series:
        return pd.Series([synth_xlsx(int(i)) for i in ids])

    return df.withColumn("data", _synth(F.col(id_col)))


_XLSX_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("cell_ref", StringType(), False),
        StructField("row_idx", IntegerType(), False),
        StructField("col_idx", IntegerType(), False),
        StructField("kind", StringType(), False),
        StructField("text", StringType(), False),
    ]
)


def xlsx_text_extract(
    df: DataFrame, data_col: str = "data", id_col: str = "doc_id"
) -> DataFrame:
    """One row per sheet1 cell with shared strings resolved —
    distributed XLSX → tabular text. One Arrow pass; unreadable
    workbooks emit nothing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for d, v in zip(b[id_col], b[data_col]):
                cells = parse_xlsx_cells(bytes(v)) if v is not None else None
                for ref, ri, ci, kind, text in cells or ():
                    rows.append((int(d), ref, ri, ci, kind, text))
            yield pd.DataFrame.from_records(
                rows, columns=[f.name for f in _XLSX_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=_XLSX_SCHEMA)
