"""WARC ingestion: render→parse round-trips, length-driven record
walking (bodies that contain record headers), gzip, malformed-record
resync, and file-grain lineage."""

from __future__ import annotations

import gzip
import os

import pytest

from web_scraper_spark.sources.warc import (
    parse_warc,
    read_warc,
    render_warc,
)


def _records(spark, blobs: list[bytes]):
    df = spark.createDataFrame([(b,) for b in blobs], "content binary")
    return parse_warc(df).collect()


def test_roundtrip_basic(spark):
    blob = render_warc(
        "https://a.example.com/x", "2025-01-02T03:04:05Z", b"<html>hi</html>"
    ) + render_warc(
        "https://a.example.com/y",
        "2025-01-02T03:04:06Z",
        b"<html>yo</html>",
        status=404,
        content_type="text/plain",
    )
    rows = sorted(_records(spark, [blob]), key=lambda r: r.url)
    assert [r.url for r in rows] == [
        "https://a.example.com/x",
        "https://a.example.com/y",
    ]
    assert rows[0].http_status == 200 and rows[1].http_status == 404
    assert bytes(rows[0].html) == b"<html>hi</html>"
    assert rows[0].warc_ts == "2025-01-02T03:04:05Z"
    assert rows[1].content_type == "text/plain"
    assert rows[0].warc_errors == 0 and rows[1].warc_errors == 0


def test_body_containing_warc_header_is_not_split(spark):
    """Content-Length drives the walk: a body embedding the record
    marker and CRLF runs must come back byte-identical (a regex/split
    reader fails this)."""
    evil = b"x\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nfake" * 3
    blob = render_warc("https://h/evil", "2025-01-01T00:00:00Z", evil) + render_warc(
        "https://h/after", "2025-01-01T00:00:01Z", b"ok"
    )
    rows = {r.url: r for r in _records(spark, [blob])}
    assert set(rows) == {"https://h/evil", "https://h/after"}
    assert bytes(rows["https://h/evil"].html) == evil
    assert bytes(rows["https://h/after"].html) == b"ok"


def test_gzip_whole_file_and_member_per_record(spark):
    recs = [
        render_warc(f"https://g/{i}", "2025-01-01T00:00:00Z", f"b{i}".encode())
        for i in range(3)
    ]
    whole = gzip.compress(b"".join(recs))
    members = b"".join(gzip.compress(r) for r in recs)  # CC convention
    for blob in (whole, members):
        urls = {r.url for r in _records(spark, [blob])}
        assert urls == {f"https://g/{i}" for i in range(3)}


def test_malformed_record_resync(spark):
    good1 = render_warc("https://h/1", "2025-01-01T00:00:00Z", b"one")
    bad = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: NOPE\r\n\r\nzzz"
    good2 = render_warc("https://h/2", "2025-01-01T00:00:01Z", b"two")
    rows = sorted(_records(spark, [good1 + bad + good2]), key=lambda r: r.url)
    assert [r.url for r in rows] == ["https://h/1", "https://h/2"]
    # the resync is reported on the record that follows the junk
    assert rows[0].warc_errors == 0
    assert rows[1].warc_errors >= 1


def test_non_response_records_keep_null_http_fields(spark):
    blob = render_warc(
        "https://h/req", "2025-01-01T00:00:00Z", b"GET / HTTP/1.1",
        warc_type="request",
    )
    (row,) = _records(spark, [blob])
    assert row.warc_type == "request"
    assert row.http_status is None and row.content_type is None
    assert bytes(row.html) == b"GET / HTTP/1.1"


def test_read_warc_files_with_lineage(spark, tmp_path):
    d = tmp_path / "warcs"
    os.makedirs(d)
    for i in range(2):
        blob = b"".join(
            render_warc(
                f"https://f{i}.com/{j}", "2025-01-01T00:00:00Z", f"{i}-{j}".encode()
            )
            for j in range(4)
        )
        mode = "wb"
        p = d / f"part{i}.warc.gz"
        with open(p, mode) as f:
            f.write(gzip.compress(blob))
    out = read_warc(spark, str(d))
    rows = out.collect()
    assert len(rows) == 8
    assert all(r.source_path.endswith(".warc.gz") for r in rows)
    # (source_path, record_offset) is unique lineage
    assert len({(r.source_path, r.record_offset) for r in rows}) == 8
    by_file: dict[str, set] = {}
    for r in rows:
        by_file.setdefault(r.source_path, set()).add(r.url)
    assert all(len(urls) == 4 for urls in by_file.values())


def test_warc_records_feed_pages_shape(spark):
    """Parsed records slot into the engine's pages contract: url +
    warc_ts + html binary, ready for resolve_pages/extract_pages."""
    from pyspark.sql import functions as F

    blob = render_warc(
        "https://shop0.example.com/order/1",
        "2025-03-04T05:06:07Z",
        b"<html><body>x</body></html>",
    )
    df = spark.createDataFrame([(blob,)], "content binary")
    pages = parse_warc(df).filter(F.col("warc_type") == "response").select(
        "url",
        F.to_timestamp("warc_ts").alias("warc_ts"),
        "html",
    )
    row = pages.collect()[0]
    assert row.warc_ts.year == 2025 and row.warc_ts.second == 7
    assert bytes(row.html).startswith(b"<html>")


def test_truncated_final_record_surfaces_trailing_error(spark):
    """ADVICE r3: a truncated final record (Content-Length runs past
    EOF) must not vanish silently — it surfaces as a final all-NULL row
    carrying warc_errors, while the preceding good record still parses
    clean."""
    good = render_warc("https://h/ok", "2025-01-01T00:00:00Z", b"fine")
    truncated = render_warc(
        "https://h/cut", "2025-01-01T00:00:01Z", b"x" * 100
    )[:-60]  # chop into the body
    rows = _records(spark, [good + truncated])
    ok = [r for r in rows if r.url == "https://h/ok"]
    tail = [r for r in rows if r.url is None]
    assert len(ok) == 1 and ok[0].warc_errors == 0
    assert len(tail) == 1 and tail[0].warc_errors >= 1
    assert tail[0].warc_type is None and tail[0].html is None


def test_trailing_junk_surfaces_error(spark):
    good = render_warc("https://h/ok", "2025-01-01T00:00:00Z", b"fine")
    rows = _records(spark, [good + b"#### trailing garbage, no header"])
    tail = [r for r in rows if r.url is None]
    assert len(tail) == 1 and tail[0].warc_errors >= 1


def test_gzip_member_streaming_with_truncated_tail(spark):
    """Member-per-record gzip where the LAST member is cut mid-stream:
    the complete members parse, the truncation surfaces as a trailing
    error row instead of throwing or silently dropping."""
    recs = [
        render_warc(f"https://g/{i}", "2025-01-01T00:00:00Z", f"b{i}".encode())
        for i in range(3)
    ]
    blob = (
        gzip.compress(recs[0])
        + gzip.compress(recs[1])
        + gzip.compress(recs[2])[:-20]  # cut into the deflate stream
    )
    rows = _records(spark, [blob])
    urls = sorted(r.url for r in rows if r.url is not None)
    assert urls == ["https://g/0", "https://g/1"]
    tail = [r for r in rows if r.url is None]
    assert len(tail) == 1 and tail[0].warc_errors >= 1


def test_gzip_large_member_decodes_in_chunks(spark):
    """A body bigger than the 1 MiB decompression chunk exercises the
    incremental buffer fill (have()/find() pulling multiple chunks)."""
    body = bytes(range(256)) * 8192  # 2 MiB
    blob = gzip.compress(
        render_warc("https://big/1", "2025-01-01T00:00:00Z", body)
        + render_warc("https://big/2", "2025-01-01T00:00:01Z", b"tiny")
    )
    rows = sorted(_records(spark, [blob]), key=lambda r: r.url)
    assert [r.url for r in rows] == ["https://big/1", "https://big/2"]
    assert bytes(rows[0].html) == body and rows[0].warc_errors == 0


def test_wet_conversion_roundtrip(spark):
    """WET conversion records (wet_record writer) parse back via the
    same reader: no HTTP envelope, NULL status/content_type, payload
    byte-identical including multi-byte text; mixes with response
    records in one archive."""
    from pyspark.sql import functions as F

    from web_scraper_spark.sources.warc import parse_warc, render_warc, wet_record

    text = "extracted café text — plain"
    df = spark.createDataFrame(
        [("https://w/x", "2025-01-01T00:00:00Z", text)], "u string, t string, x string"
    )
    wet = df.select(
        F.encode(wet_record(F.col("u"), F.col("t"), F.col("x")), "UTF-8").alias("w")
    ).collect()[0]["w"]
    resp = render_warc("https://w/y", "2025-01-01T00:00:01Z", b"<html>y</html>")
    blob = spark.createDataFrame([(bytes(wet) + resp,)], "content binary")
    rows = {r["url"]: r for r in parse_warc(blob).collect()}
    c = rows["https://w/x"]
    assert c["warc_type"] == "conversion"
    assert c["http_status"] is None and c["content_type"] is None
    assert bytes(c["html"]).decode("utf-8") == text
    assert c["n_body_bytes"] == len(text.encode("utf-8"))
    r = rows["https://w/y"]
    assert r["warc_type"] == "response" and r["http_status"] == 200
