"""ZIP archive index + DOCX text extraction (operators/zipindex.py):
formula parity, stdlib-zipfile cross-validation, untrusted-payload
bounds (EOCD count bombs, deflate ratio bombs, CRC enforcement), and
the Spark stage contract (no shuffle; malformed rows emit nothing)."""

from __future__ import annotations

import io
import random
import zipfile
import zlib

from pyspark.sql import functions as F

from web_scraper_spark.operators.zipindex import (
    _zip_build,
    docx_text_extract,
    extract_zip_member,
    parse_docx_paragraphs,
    parse_zip_entries,
    synth_docx,
    synth_docx_n_paras,
    synth_zip,
    synth_zip_n_members,
    synth_zip_payload_len,
    with_synth_docx,
    with_synth_zip,
    zip_entry_index,
)


def _expected_entries(doc_id: int):
    exp, off = [], 0
    for i in range(synth_zip_n_members(doc_id)):
        plen = synth_zip_payload_len(doc_id, i)
        payload = bytes(
            0x20 + (doc_id * 5 + i * 3 + k) % 90 for k in range(plen)
        )
        exp.append(
            (i, f"f{i}.txt", 0, plen, plen, zlib.crc32(payload), off, off + 36)
        )
        off += 36 + plen
    return exp


def test_entry_index_formula_parity():
    for doc_id in range(32):
        assert parse_zip_entries(synth_zip(doc_id)) == _expected_entries(
            doc_id
        ), doc_id


def test_stdlib_zipfile_agrees():
    # the synthesized archives must be REAL ZIPs: stdlib zipfile reads
    # them, CRC-checks them, and returns byte-identical member content
    for doc_id in (0, 3, 9):
        data = synth_zip(doc_id)
        zf = zipfile.ZipFile(io.BytesIO(data))
        assert zf.testzip() is None
        for i in range(synth_zip_n_members(doc_id)):
            name = f"f{i}.txt"
            assert zf.read(name) == extract_zip_member(data, name)
        dx = synth_docx(doc_id)
        zdx = zipfile.ZipFile(io.BytesIO(dx))
        assert zdx.testzip() is None  # the deflate member round-trips
        assert zdx.read("word/document.xml") == extract_zip_member(
            dx, "word/document.xml"
        )


def test_docx_paragraph_parity():
    for doc_id in range(32):
        assert parse_docx_paragraphs(synth_docx(doc_id)) == [
            (k, f"doc {doc_id} para {k} run 1")
            for k in range(synth_docx_n_paras(doc_id))
        ], doc_id


def test_xml_unescape_and_empty_paragraphs():
    xml = (
        b'<?xml version="1.0"?><w:document><w:body>'
        b"<w:p ><w:r><w:t>a &amp; b &lt;c&gt; &quot;d&quot;</w:t></w:r></w:p>"
        b"<w:p/></w:body></w:document>"
    )
    arch = _zip_build([(b"word/document.xml", 0, xml, xml)])
    assert parse_docx_paragraphs(arch) == [(0, 'a & b <c> "d"'), (1, "")]


def test_eocd_found_past_archive_comment():
    data = bytearray(synth_zip(2))
    # a trailing archive comment must not break the backward EOCD scan
    p = bytes(data).rfind(b"PK\x05\x06")
    comment = b"mirrored by example.org"
    data[p + 20 : p + 22] = len(comment).to_bytes(2, "little")
    data += comment
    assert parse_zip_entries(bytes(data)) == _expected_entries(2)


def test_count_bomb_and_lying_extents_refused():
    bomb = bytearray(synth_zip(1))
    p = bytes(bomb).rfind(b"PK\x05\x06")
    for field in (8, 10):  # this-disk and total entry counts
        bomb[p + field : p + field + 2] = (60000).to_bytes(2, "little")
    assert parse_zip_entries(bytes(bomb)) is None
    # a member whose declared extent runs past the payload is refused
    cut = synth_zip(3)[:40]
    assert parse_zip_entries(cut) is None


def test_deflate_ratio_bomb_and_crc_refused():
    big = b"A" * 1_000_000
    comp = zlib.compressobj(9, zlib.DEFLATED, -15)
    blob = comp.compress(big) + comp.flush()
    # usize/crc recorded from a 100-byte slice: stream inflates 10000x
    # past the declared size -> capped and refused, not ballooned
    lie = _zip_build([(b"word/document.xml", 8, blob, big[:100])])
    assert extract_zip_member(lie, "word/document.xml") is None
    # stored member with a flipped payload byte fails the CRC check
    good = synth_zip(4)
    ents = parse_zip_entries(good)
    doff = ents[0][7]
    bad = bytearray(good)
    bad[doff] ^= 0xFF
    assert extract_zip_member(bytes(bad), "f0.txt") is None


def test_malformed_never_raises():
    d = synth_docx(5)
    for cut in range(0, len(d), 3):
        parse_zip_entries(d[:cut])
        parse_docx_paragraphs(d[:cut])
    rng = random.Random(3)
    for _ in range(300):
        junk = bytes(rng.randrange(256) for _ in range(rng.randrange(200)))
        parse_zip_entries(junk)
        parse_docx_paragraphs(junk)
    assert parse_zip_entries(b"") is None
    assert parse_zip_entries(b"PK\x03\x04 not really") is None


def test_zip_stages_no_shuffle(spark):
    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    out = zip_entry_index(with_synth_zip(docs))
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for d in range(24):
        got = [
            (r.entry_idx, r.name, r.method, r.comp_len, r.uncomp_len,
             r.crc32, r.header_off, r.data_off)
            for r in sorted(by_doc[d], key=lambda r: r.entry_idx)
        ]
        assert got == _expected_entries(d), d
    paras = docx_text_extract(with_synth_docx(docs))
    assert paras.count() == sum(synth_docx_n_paras(d) for d in range(24))
    for df in (out, paras):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # payload bytes never shuffle


def test_zip_stage_malformed_rows_emit_nothing(spark):
    rows = [
        (1, bytearray(synth_zip(1))),
        (2, bytearray(b"PK\x03\x04 truncated")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, data binary")
    out = zip_entry_index(df).collect()
    assert {r.doc_id for r in out} == {1}
    assert len(out) == len(_expected_entries(1))


# ---------------------------------------------------------------------------
# EPUB (OCF container -> OPF spine -> XHTML)
# ---------------------------------------------------------------------------

from web_scraper_spark.operators.zipindex import (  # noqa: E402
    epub_text_extract,
    parse_epub_chapters,
    synth_epub,
    synth_epub_n_chapters,
    with_synth_epub,
)


def _expected_chapters(doc_id: int):
    n = synth_epub_n_chapters(doc_id)
    return [
        (
            idx,
            f"OEBPS/ch{i}.xhtml",
            f"doc {doc_id} ch {i} heading doc {doc_id} ch {i} para &",
        )
        for idx, i in enumerate(reversed(range(n)))
    ]


def test_epub_chapter_parity_spine_order():
    # the synth spine REVERSES manifest order: honoring the spine (not
    # the manifest) is what makes the parity hold, and the non-spine
    # cover.png decoy must never surface
    for doc_id in range(32):
        assert parse_epub_chapters(synth_epub(doc_id)) == _expected_chapters(
            doc_id
        ), doc_id


def test_epub_is_a_real_zip():
    import io
    import zipfile as zf_mod

    for doc_id in (0, 5):
        zf = zf_mod.ZipFile(io.BytesIO(synth_epub(doc_id)))
        assert zf.testzip() is None
        assert zf.read("mimetype") == b"application/epub+zip"


def test_epub_spine_outside_manifest_refused():
    data = synth_epub(1)
    opf_plain = extract_zip_member(data, "OEBPS/content.opf")
    # a spine idref with no manifest item is a structural violation
    bad_opf = opf_plain.replace(b'idref="c0"', b'idref="ghost"')
    comp = zlib.compressobj(6, zlib.DEFLATED, -15)
    blob = comp.compress(bad_opf) + comp.flush()
    ents = parse_zip_entries(data)
    rebuilt = []
    for _i, name, method, csize, _us, _crc, _lfh, doff in ents:
        plain = extract_zip_member(data, name)
        if name == "OEBPS/content.opf":
            rebuilt.append((name.encode(), 8, blob, bad_opf))
        else:
            raw = data[doff : doff + csize]
            rebuilt.append((name.encode(), method, raw, plain))
    assert parse_epub_chapters(_zip_build(rebuilt)) is None


def test_epub_truncation_and_fuzz_never_raise():
    d = synth_epub(7)
    for cut in range(0, len(d), 5):
        parse_epub_chapters(d[:cut])
    rng = random.Random(5)
    for _ in range(200):
        parse_epub_chapters(
            bytes(rng.randrange(256) for _ in range(rng.randrange(200)))
        )


def test_epub_stage(spark):
    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    out = epub_text_extract(with_synth_epub(docs))
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for d in range(24):
        got = [
            (r.spine_idx, r.href, r.text)
            for r in sorted(by_doc[d], key=lambda r: r.spine_idx)
        ]
        assert got == _expected_chapters(d), d
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# XLSX (SpreadsheetML shared strings + sheet cells)
# ---------------------------------------------------------------------------

from web_scraper_spark.operators.zipindex import (  # noqa: E402
    _a1_to_rc,
    parse_xlsx_cells,
    synth_xlsx,
    synth_xlsx_n_rows,
    with_synth_xlsx,
    xlsx_text_extract,
)


def _expected_cells(doc_id: int):
    exp = []
    for r in range(synth_xlsx_n_rows(doc_id)):
        exp.append((f"A{r + 1}", r, 0, "s", f"doc {doc_id} r {r}"))
        exp.append((f"B{r + 1}", r, 1, "n", str(10 * doc_id + r)))
    return exp


def test_a1_reference_parsing():
    assert _a1_to_rc(b"A1") == (0, 0)
    assert _a1_to_rc(b"B2") == (1, 1)
    assert _a1_to_rc(b"AA10") == (9, 26)  # base-26 letters
    assert _a1_to_rc(b"1A") is None
    assert _a1_to_rc(b"A0") is None
    assert _a1_to_rc(b"ZZZ") is None


def test_xlsx_cell_parity():
    # column A goes through shared-string indirection (last <si> split
    # into two <r> runs); column B is literal numerics
    for doc_id in range(32):
        assert parse_xlsx_cells(synth_xlsx(doc_id)) == _expected_cells(
            doc_id
        ), doc_id


def test_xlsx_dangling_shared_string_refused():
    data = synth_xlsx(1)
    sheet = extract_zip_member(data, "xl/worksheets/sheet1.xml")
    bad_sheet = sheet.replace(b"<v>0</v>", b"<v>999</v>", 1)
    comp = zlib.compressobj(6, zlib.DEFLATED, -15)
    blob = comp.compress(bad_sheet) + comp.flush()
    ents = parse_zip_entries(data)
    rebuilt = []
    for _i, name, method, csize, _us, _crc, _lfh, doff in ents:
        if name == "xl/worksheets/sheet1.xml":
            rebuilt.append((name.encode(), 8, blob, bad_sheet))
        else:
            rebuilt.append(
                (name.encode(), method, data[doff : doff + csize],
                 extract_zip_member(data, name))
            )
    assert parse_xlsx_cells(_zip_build(rebuilt)) is None


def test_xlsx_inline_str_and_empty_cells():
    sheet = (
        b'<?xml version="1.0"?><worksheet><sheetData>'
        b'<row r="1"><c r="A1" t="inlineStr"><is><t>in&amp;line</t></is></c>'
        b'<c r="B1" s="2"/></row></sheetData></worksheet>'
    )
    arch = _zip_build([(b"xl/worksheets/sheet1.xml", 0, sheet, sheet)])
    # no sharedStrings member at all: inline/numeric paths still work
    assert parse_xlsx_cells(arch) == [("A1", 0, 0, "inlineStr", "in&line")]


def test_xlsx_truncation_and_fuzz_never_raise():
    d = synth_xlsx(7)
    for cut in range(0, len(d), 5):
        parse_xlsx_cells(d[:cut])
    rng = random.Random(11)
    for _ in range(200):
        parse_xlsx_cells(
            bytes(rng.randrange(256) for _ in range(rng.randrange(200)))
        )


def test_xlsx_stage(spark):
    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    out = xlsx_text_extract(with_synth_xlsx(docs))
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for d in range(24):
        got = [
            (r.cell_ref, r.row_idx, r.col_idx, r.kind, r.text)
            for r in sorted(by_doc[d], key=lambda r: (r.row_idx, r.col_idx))
        ]
        assert got == _expected_cells(d), d
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
