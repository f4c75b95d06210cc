"""PDF document index (operators/pdf.py): classic-xref walk parity,
incremental-update /Prev chains, nested page trees, untrusted-payload
bounds (xref count bombs, /Prev cycles), and the Spark stage contract
(no shuffle; malformed payloads emit nothing, never a failure)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from web_scraper_spark.operators.pdf import (
    parse_pdf_objects,
    parse_pdf_pages,
    pdf_object_index,
    pdf_page_index,
    synth_pdf,
    synth_pdf_n_pages,
    synth_pdf_stream_len,
    with_synth_pdf,
)


def _expected_objects(doc_id: int):
    n = synth_pdf_n_pages(doc_id)
    exp = [
        (0, 65535, 0, 0, "free", None),
        (1, 0, 9, 1, "catalog", None),
        (2, 0, 105, 1, "pages", None),
    ]
    exp += [(2 + j, 0, 9 + 96 * (1 + j), 1, "page", None) for j in range(1, n + 1)]
    exp += [
        (
            2 + n + j,
            0,
            9 + 96 * (2 + n) + 160 * (j - 1),
            1,
            "stream",
            synth_pdf_stream_len(doc_id, j - 1),
        )
        for j in range(1, n + 1)
    ]
    return exp


def test_object_index_formula_parity():
    for doc_id in range(32):
        data = synth_pdf(doc_id)
        assert parse_pdf_objects(data) == _expected_objects(doc_id), doc_id


def test_offsets_point_at_real_object_heads():
    for doc_id in (0, 5, 11):
        data = synth_pdf(doc_id)
        for num, _gen, off, used, _cls, _sl in parse_pdf_objects(data):
            if used:
                head = f"{num} 0 obj".encode()
                assert data[off : off + len(head)] == head


def test_page_index_formula_parity():
    for doc_id in range(32):
        data = synth_pdf(doc_id)
        n = synth_pdf_n_pages(doc_id)
        base = 9 + 96 * (2 + n)
        assert parse_pdf_pages(data) == [
            (
                j,
                3 + j,
                3 + n + j,
                base + 160 * j,
                base + 160 * j + 32,
                synth_pdf_stream_len(doc_id, j),
            )
            for j in range(n)
        ], doc_id


def test_stream_extent_delimits_payload():
    # the (stream_off, stream_len) extent must slice exactly the synth
    # filler bytes — the range a distributed text extractor would read
    for doc_id in (2, 7):
        data = synth_pdf(doc_id)
        for j, _pobj, _cobj, _coff, soff, slen in parse_pdf_pages(data):
            want = bytes((doc_id * 5 + j * 3 + k) % 255 for k in range(slen))
            assert data[soff : soff + slen] == want


def test_incremental_update_prev_chain():
    base = synth_pdf(4)  # n=2 -> 6 objects
    new_obj = b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R /Extra true >>\nendobj\n"
    off1 = len(base)
    upd = bytearray(base) + new_obj
    x2 = len(upd)
    sx = base.rfind(b"startxref")
    old_xref = int(base[sx + 9 : sx + 32].split()[0])
    upd += (
        f"xref\n1 1\n{off1:010d} 00000 n \n"
        f"trailer\n<< /Size 7 /Root 1 0 R /Prev {old_xref} >>\n"
        f"startxref\n{x2}\n%%EOF\n"
    ).encode()
    objs = parse_pdf_objects(bytes(upd))
    assert len(objs) == 7
    by_num = {r[0]: r for r in objs}
    # newest section wins for object 1; everything else from the base
    assert by_num[1][2] == off1 and by_num[1][4] == "catalog"
    for num, _g, off, *_ in parse_pdf_objects(base):
        if num != 1:
            assert by_num[num][2] == off
    assert len(parse_pdf_pages(bytes(upd))) == 2


def test_nested_page_tree_document_order():
    objs: dict[int, int] = {}
    body = bytearray(b"%PDF-1.7\n")

    def emit(num: int, text: bytes) -> None:
        objs[num] = len(body)
        body.extend(f"{num} 0 obj\n".encode() + text + b"endobj\n")

    emit(1, b"<< /Type /Catalog /Pages 2 0 R >>\n")
    emit(2, b"<< /Type /Pages /Kids [3 0 R 6 0 R] /Count 3 >>\n")
    emit(3, b"<< /Type /Pages /Parent 2 0 R /Kids [4 0 R 5 0 R] /Count 2 >>\n")
    emit(4, b"<< /Type /Page /Parent 3 0 R /Contents 7 0 R >>\n")
    emit(5, b"<< /Type /Page /Parent 3 0 R /Contents 8 0 R >>\n")
    emit(6, b"<< /Type /Page /Parent 2 0 R /Contents 9 0 R >>\n")
    for num, pl in ((7, 10), (8, 11), (9, 12)):
        emit(
            num,
            f"<< /Length {pl} >>\n".encode()
            + b"stream\n"
            + bytes(range(pl))
            + b"\nendstream\n",
        )
    xo = len(body)
    body += f"xref\n0 {len(objs) + 1}\n".encode() + b"0000000000 65535 f \n"
    for num in range(1, len(objs) + 1):
        body += f"{objs[num]:010d} 00000 n \n".encode()
    body += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xo}\n%%EOF\n"
    ).encode()
    pages = parse_pdf_pages(bytes(body))
    assert [p[1] for p in pages] == [4, 5, 6]  # depth-first document order
    assert [p[2] for p in pages] == [7, 8, 9]
    assert [p[5] for p in pages] == [10, 11, 12]


def test_malformed_never_raises():
    d = synth_pdf(5)
    for cut in range(len(d)):  # every truncation point
        parse_pdf_objects(d[:cut])
        parse_pdf_pages(d[:cut])
    rng = random.Random(7)
    for _ in range(300):
        junk = bytes(rng.randrange(256) for _ in range(rng.randrange(300)))
        parse_pdf_objects(junk)
        parse_pdf_pages(junk)
    assert parse_pdf_objects(b"") is None
    assert parse_pdf_objects(b"%PDF-1.7\n") is None
    assert parse_pdf_objects(b"not a pdf at all") is None


def test_untrusted_count_and_cycle_bounds():
    # an 8-byte-ish header declaring 1e9 xref entries must be refused
    # before any loop/allocation (same contract as jpeg.py/video.py)
    bomb = (
        b"%PDF-1.7\nxref\n0 999999999\n"
        b"trailer\n<< /Size 2 /Root 1 0 R >>\nstartxref\n9\n%%EOF\n"
    )
    assert parse_pdf_objects(bomb) is None
    # a /Prev pointing back at the same xref must terminate, not spin
    loop = bytearray(synth_pdf(1))
    sx = bytes(loop).rfind(b"startxref")
    xo = int(bytes(loop)[sx + 9 : sx + 32].split()[0])
    t = bytes(loop).rfind(b">>")
    loop[t:t] = f" /Prev {xo}".encode()
    assert parse_pdf_objects(bytes(loop)) is None


def test_pdf_stages_no_shuffle(spark):
    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    fixture = with_synth_pdf(docs)
    out = pdf_object_index(fixture)
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for d in range(24):
        got = [
            (r.obj_num, r.gen, r.offset, r.in_use, r.obj_class, r.stream_len)
            for r in sorted(by_doc[d], key=lambda r: r.obj_num)
        ]
        assert got == _expected_objects(d), d
    pages = pdf_page_index(fixture)
    assert pages.count() == sum(synth_pdf_n_pages(d) for d in range(24))
    for df in (out, pages):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # payload bytes never shuffle


def test_pdf_stage_malformed_rows_emit_nothing(spark):
    rows = [
        (1, bytearray(synth_pdf(1))),
        (2, bytearray(b"%PDF-1.7\ngarbage, no xref")),
        (3, bytearray(b"\x00\x01\x02")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, data binary")
    out = pdf_object_index(df).collect()
    assert {r.doc_id for r in out} == {1}
    assert len(out) == len(_expected_objects(1))


# ---------------------------------------------------------------------------
# text extraction (Tj / TJ / Td walk)
# ---------------------------------------------------------------------------

from web_scraper_spark.operators.pdf import (  # noqa: E402
    _pdf_literal_string,
    _text_runs,
    parse_pdf_text_runs,
    pdf_text_extract,
    synth_pdf_text,
    synth_pdf_text_n_lines,
    with_synth_pdf_text,
)


def _expected_text(doc_id: int):
    return [
        (j, k, 72, 708 - 14 * k, f"doc {doc_id} page {j} line {k}")
        for j in range(synth_pdf_n_pages(doc_id))
        for k in range(synth_pdf_text_n_lines(doc_id, j))
    ]


def test_text_runs_formula_parity():
    for doc_id in range(32):
        assert parse_pdf_text_runs(synth_pdf_text(doc_id)) == _expected_text(
            doc_id
        ), doc_id


def test_literal_string_escapes():
    # named escapes, balanced nesting, octal (3-digit, 8-bit wrap),
    # line continuation, and the drop-the-backslash rule for unknowns
    s, _ = _pdf_literal_string(rb"(a\(b\)c \\ \110\151 (nested) \n\501\x)", 0)
    assert s == b"a(b)c \\ Hi (nested) \nAx"
    s, _ = _pdf_literal_string(b"(one\\\ntwo)", 0)  # continuation joins lines
    assert s == b"onetwo"
    assert _pdf_literal_string(b"(unterminated", 0) is None


def test_tj_array_concatenates_string_parts():
    runs = _text_runs(b"BT 10 20 Td [(Hel) -250 (lo)] TJ ET")
    assert runs == [(10.0, 20.0, b"Hello")]


def test_td_cursor_tracking_and_bt_reset():
    runs = _text_runs(
        b"BT 72 700 Td (a) Tj 0 -14 Td (b) Tj ET BT 10 20 Td (c) Tj ET"
    )
    assert runs == [(72.0, 700.0, b"a"), (72.0, 686.0, b"b"), (10.0, 20.0, b"c")]


def test_malformed_content_streams_refused():
    assert _text_runs(b"BT (oops Tj ET") is None  # unterminated string
    assert _text_runs(b"BT Tj ET") is None  # Tj with no operand
    # graphics operators between text ops are skipped, not fatal
    runs = _text_runs(b"q 1 0 0 1 0 0 cm BT 5 6 Td (ok) Tj ET Q")
    assert runs == [(5.0, 6.0, b"ok")]


def test_text_truncation_never_raises():
    d = synth_pdf_text(7)
    for cut in range(0, len(d), 3):
        parse_pdf_text_runs(d[:cut])


def test_pdf_text_stage(spark):
    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    out = pdf_text_extract(with_synth_pdf_text(docs))
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for d in range(24):
        got = [
            (r.page_idx, r.run_idx, r.x, r.y, r.text)
            for r in sorted(by_doc[d], key=lambda r: (r.page_idx, r.run_idx))
        ]
        assert got == _expected_text(d), d
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def _synth_flate_pdf(doc_id: int) -> bytes:
    """synth_pdf_text variant whose content streams are FlateDecode."""
    import zlib as _z

    from web_scraper_spark.operators.pdf import (
        synth_pdf_n_pages as _np,
        synth_pdf_text_n_lines as _nl,
    )

    n = _np(doc_id)
    n_obj = 2 + 2 * n
    buf = bytearray(b"%PDF-1.7\n")
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
        for k in range(_nl(doc_id, j)):
            td = b"72 708 Td" if k == 0 else b"0 -14 Td"
            lines.append(td + f" (doc {doc_id} page {j} line {k}) Tj".encode())
        lines.append(b"ET")
        comp = _z.compress(b"\n".join(lines) + b"\n")
        emit(
            3 + n + j,
            f"<< /Length {len(comp)} /Filter /FlateDecode >>\n".encode()
            + b"stream\n"
            + comp
            + b"\nendstream\n",
        )
    xo = len(buf)
    buf += f"xref\n0 {n_obj + 1}\n".encode() + b"0000000000 65535 f \n"
    for num in range(1, n_obj + 1):
        buf += f"{offsets[num]:010d} 00000 n \n".encode()
    buf += (
        f"trailer\n<< /Size {n_obj + 1} /Root 1 0 R >>\n"
        f"startxref\n{xo}\n%%EOF\n"
    ).encode()
    return bytes(buf)


def test_flate_streams_decode_identically():
    for doc_id in range(16):
        assert parse_pdf_text_runs(_synth_flate_pdf(doc_id)) == _expected_text(
            doc_id
        ), doc_id


def test_flate_bomb_and_corrupt_refused():
    import zlib as _z

    from web_scraper_spark.operators.pdf import _MAX_INFLATE, _content_bytes

    # a tiny stream inflating past the cap must be refused, not ballooned
    bomb = _z.compress(b"BT " + b"(x) Tj " * (_MAX_INFLATE // 7) + b"ET")
    doc = bytearray(b"%PDF-1.7\n")
    off = len(doc)
    doc += (
        f"5 0 obj\n<< /Length {len(bomb)} /Filter /FlateDecode >>\n".encode()
        + b"stream\n" + bomb + b"\nendstream\nendobj\n"
    )
    data = bytes(doc)
    soff = data.find(b"stream\n") + 7
    assert _content_bytes(data, off, soff, len(bomb)) is None
    # corrupt deflate data (same length, so the region still parses)
    # -> None, not an exception and not partial text
    corrupt = bomb[:10] + bytes(len(bomb) - 10)
    assert _content_bytes(
        bytes(doc).replace(bomb, corrupt), off, soff, len(bomb)
    ) is None


def test_contents_array_streams_concatenate():
    # /Contents [7 0 R 8 0 R]: the two streams form ONE content stream
    # (ISO 32000 §7.7.3.3) — text split across them must still decode
    objs: dict[int, int] = {}
    body = bytearray(b"%PDF-1.7\n")

    def emit(num: int, text: bytes) -> None:
        objs[num] = len(body)
        body.extend(f"{num} 0 obj\n".encode() + text + b"endobj\n")

    emit(1, b"<< /Type /Catalog /Pages 2 0 R >>\n")
    emit(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>\n")
    emit(3, b"<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>\n")
    part1 = b"BT 72 708 Td (first) Tj"
    part2 = b"0 -14 Td (second) Tj ET"
    for num, content in ((4, part1), (5, part2)):
        emit(
            num,
            f"<< /Length {len(content)} >>\n".encode()
            + b"stream\n" + content + b"\nendstream\n",
        )
    xo = len(body)
    body += f"xref\n0 {len(objs) + 1}\n".encode() + b"0000000000 65535 f \n"
    for num in range(1, len(objs) + 1):
        body += f"{objs[num]:010d} 00000 n \n".encode()
    body += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xo}\n%%EOF\n"
    ).encode()
    runs = parse_pdf_text_runs(bytes(body))
    assert runs == [(0, 0, 72, 708, "first"), (0, 1, 72, 694, "second")]
