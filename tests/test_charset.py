"""Charset sniffing/decoding: BOM, meta declarations, UTF-8 sniff,
windows-1252 fallback, mislabeled pages, and the never-throws contract
on arbitrary bytes."""

from __future__ import annotations

from web_scraper_spark.operators.charset import decode_html, detect_and_decode


def test_detect_and_decode_pure_python_edges():
    # BOM beats everything, and is stripped
    assert detect_and_decode(b"\xef\xbb\xbfhi") == ("hi", "utf-8-bom")
    # valid UTF-8 multibyte
    assert detect_and_decode("café".encode()) == ("café", "utf-8")
    # invalid UTF-8 → windows-1252 (0xE9 = é)
    assert detect_and_decode(b"caf\xe9 ok") == ("café ok", "windows-1252")
    # declared charset honored — WHATWG label mapping: iso-8859-1 is a
    # LABEL for windows-1252 (browsers decode 0x80-0x9F as punctuation)
    t, c = detect_and_decode(
        b'<meta charset="iso-8859-1">caf\xe9'
    )
    assert c == "windows-1252" and t.endswith("café")
    # latin-1-labeled page using cp1252 smart quotes in 0x80-0x9F:
    # decodes to curly quotes, never C1 control characters
    t, c = detect_and_decode(b'<meta charset="latin-1">\x93hi\x94')
    assert c == "windows-1252" and "“hi”" in t
    # http-equiv form
    t, c = detect_and_decode(
        b'<meta http-equiv="Content-Type" content="text/html; '
        b'charset=windows-1252">\x93quoted\x94'
    )
    assert c == "windows-1252" and "“quoted”" in t
    # MISLABELED: declared charset fails to decode → sniff (utf-8 wins)
    t, c = detect_and_decode(
        '<meta charset="ascii">héllo'.encode()
    )
    assert c == "utf-8" and t.endswith("héllo")
    # arbitrary binary garbage never raises
    t, c = detect_and_decode(bytes(range(256)))
    assert c == "windows-1252" and isinstance(t, str)
    # declaration outside the 1024-byte prescan window is ignored
    blob = b" " * 1100 + b'<meta charset="iso-8859-1">' + b"caf\xe9"
    t, c = detect_and_decode(blob)
    assert c == "windows-1252"  # sniff path, not the late meta


def test_decode_html_stage(spark):
    rows = [
        (1, "café utf8".encode()),
        (2, b"\xef\xbb\xbfbom page"),
        (3, b"latin \xe9\xf1 bytes"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html binary")
    out = {r.doc_id: (r.text, r.charset) for r in decode_html(df).collect()}
    assert out[1] == ("café utf8", "utf-8")
    assert out[2] == ("bom page", "utf-8-bom")
    assert out[3] == ("latin éñ bytes", "windows-1252")
    assert out[4] == (None, None)
    # html column is gone (wide bytes stop at this stage)
    assert "html" not in decode_html(df).columns
