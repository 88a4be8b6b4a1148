"""WARC adapter: record framing by Content-Length, gzip-member decode,
record-type filtering, HTTP header strip, and the Spark binaryFile →
mapInPandas ingest round trip."""

import gzip

from pyspark.sql import functions as F

from ankiocr_spark.warc import (
    build_warc,
    iter_warc_records,
    parse_warc_pages,
    read_warc,
    write_warc_dump,
)


def _mk(url, html=b"<p>hello</p>"):
    return (url, "2026-01-01T00:00:00Z", html)


def test_round_trip_plain_and_gz():
    recs = [_mk("https://a/1"), _mk("https://a/2", b"<p>two</p>")]
    for gz in (False, True):
        data = build_warc(recs, gzip_members=gz)
        pages = parse_warc_pages(data)
        assert [(u, h) for u, _, h in pages] == [
            ("https://a/1", b"<p>hello</p>"),
            ("https://a/2", b"<p>two</p>"),
        ]
        assert all(ts is not None for _, ts, _ in pages)


def test_payload_containing_warc_magic_is_framed_correctly():
    """Content-Length framing: a body containing 'WARC/1.0' must not be
    mistaken for a record boundary."""
    tricky = b"<p>literal WARC/1.0\r\n\r\nmarker inside body</p>"
    data = build_warc([_mk("https://a/x", tricky), _mk("https://a/y")],
                      gzip_members=False)
    pages = parse_warc_pages(data)
    assert [u for u, _, _ in pages] == ["https://a/x", "https://a/y"]
    assert pages[0][2] == tricky


def test_non_response_records_skipped():
    data = build_warc([_mk("https://a/1")], gzip_members=False)
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: https://a/1\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    )
    pages = parse_warc_pages(info + req + data)
    assert len(pages) == 1 and pages[0][0] == "https://a/1"
    # but the raw record iterator sees all three
    assert len(list(iter_warc_records(info + req + data))) == 3


def test_http_headers_stripped():
    pages = parse_warc_pages(build_warc([_mk("https://a/1")], gzip_members=False))
    assert pages[0][2] == b"<p>hello</p>"  # no HTTP/1.1 prefix


def test_multi_member_gzip():
    recs = [_mk(f"https://a/{i}") for i in range(5)]
    data = build_warc(recs, gzip_members=True)
    # must be several independent members, not one stream
    assert data.count(b"\x1f\x8b\x08") >= 5
    assert len(parse_warc_pages(data)) == 5
    # single-stream gzip of the plain form also decodes
    single = gzip.compress(build_warc(recs, gzip_members=False))
    assert len(parse_warc_pages(single)) == 5


def test_missing_content_length_raises_for_quarantine():
    """A record without a parseable Content-Length must raise (ISO 28500
    makes the header mandatory): the old resync-on-next-'WARC/' behavior
    could lock onto a 'WARC/' occurrence INSIDE a payload and fabricate
    bogus records. read_warc turns the raise into a file quarantine."""
    import pytest

    no_len = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://a/1\r\n\r\n<p>body WARC/1.0 trap</p>"
    )
    with pytest.raises(ValueError, match="Content-Length"):
        list(iter_warc_records(no_len))
    bad_len = no_len.replace(b"\r\n\r\n<p>", b"\r\nContent-Length: nan\r\n\r\n<p>")
    with pytest.raises(ValueError, match="Content-Length"):
        list(iter_warc_records(bad_len))


def test_spark_ingest_round_trip(spark, tmp_path):
    rows = [
        (f"https://w/{i}", "2026-01-01T00:00:00Z",
         f"<p>page {i} body long enough to keep for the block floor</p>".encode())
        for i in range(40)
    ]
    out_dir = str(tmp_path / "warcs")
    write_warc_dump(rows, out_dir, n_files=4)
    df = read_warc(spark, out_dir)
    got = {r["url"]: r["html"] for r in df.collect()}
    assert len(got) == 40
    assert bytes(got["https://w/7"]) == rows[7][2]
    assert df.where(F.col("warc_ts").isNull()).count() == 0
    assert df.schema.simpleString().startswith(
        "struct<url:string,warc_ts:timestamp,html:binary"
    )


def test_corrupt_file_quarantined_not_fatal(spark, tmp_path):
    """A truncated gzip member in one delivery file must not kill the
    ingest: the file yields one error-marker row; healthy files parse."""
    out_dir = str(tmp_path / "warcs_bad")
    write_warc_dump(
        [_mk(f"https://ok/{i}") for i in range(10)], out_dir, n_files=2
    )
    good = build_warc([_mk("https://ok/extra")])
    with open(f"{out_dir}/crawl-bad.warc.gz", "wb") as fh:
        fh.write(good[: len(good) // 2])  # truncated mid-member
    df = read_warc(spark, out_dir)
    rows = df.collect()
    errors = [r for r in rows if r["url"].startswith("warc:error:")]
    pages = [r for r in rows if not r["url"].startswith("warc:error:")]
    assert len(errors) == 1
    assert "crawl-bad" in errors[0]["url"] and errors[0]["html"] is None
    assert errors[0]["text"]  # the error message rides the text column
    assert len(pages) == 10


def test_distributed_dump_matches_driver_side_writer(spark, tmp_path):
    """write_warc_dump_distributed (foreachPartition writer tasks) must land
    the same RECORD SET as the driver-side writer — file→record assignment
    may differ (hash partitioning vs round-robin), the parsed union may not."""
    from ankiocr_spark.warc import write_warc_dump_distributed

    rows = [
        (f"https://d/{i}", "2026-01-01T00:00:00Z",
         f"<p>distributed page {i} with enough body text to matter</p>".encode())
        for i in range(30)
    ]
    drv_dir, dist_dir = str(tmp_path / "drv"), str(tmp_path / "dist")
    write_warc_dump(rows, drv_dir, n_files=4)
    pages = spark.createDataFrame(
        [(u, d, h) for u, d, h in rows],
        "url string, warc_date string, html binary",
    )
    write_warc_dump_distributed(pages, dist_dir, n_files=4)
    a = {(r["url"], bytes(r["html"])) for r in read_warc(spark, drv_dir).collect()}
    b = {(r["url"], bytes(r["html"])) for r in read_warc(spark, dist_dir).collect()}
    assert a == b and len(a) == 30
