"""WARC source round-trip (sources/warc.py).

Contract: pack(pages) |> parse == pages, byte-identical html per url, exact
warc_ts micros, lang preserved — in both plain and per-record-gzip layouts.
The adversarial case is html that CONTAINS WARC framing text: the parser
walks Content-Length, so it must not resynchronize on payload bytes.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from graphiti_spark.sources.warc import (
    pack_warc_files,
    parse_warc_files,
    to_warc_records,
    warc_record_py,
    _iter_warc_records,
)


def _pages(spark):
    rows = [
        (
            "https://a.example.com/1",
            datetime(2024, 1, 7, 12, 0, 0, 123456, tzinfo=timezone.utc),
            b"<html><body><p>Alice Smith founded Acme Systems.</p></body></html>",
            "en",
        ),
        (
            # payload embedding WARC framing text — must not desync the parser
            "https://a.example.com/2",
            datetime(2024, 1, 8, 0, 0, 0, tzinfo=timezone.utc),
            "<html><body><p>WARC/1.0\r\nContent-Length: 99</p><p>Café résumé 中文</p></body></html>".encode(
                "utf-8"
            ),
            "fr",
        ),
        ("https://b.example.org/empty", datetime(2024, 2, 1, tzinfo=timezone.utc), b"", None),
    ]
    return spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary, lang string")


def _roundtrip(spark, gz: bool):
    pages = _pages(spark)
    files = pack_warc_files(to_warc_records(pages), n_files=2, gzip_per_record=gz)
    got = (
        parse_warc_files(files, gzip_per_record=gz)
        .select("url", F.unix_micros("warc_ts").alias("ts_us"), "html", "lang")
        .sort("url")
        .collect()
    )
    want = (
        pages.select("url", F.unix_micros("warc_ts").alias("ts_us"), "html", "lang")
        .sort("url")
        .collect()
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.url == w.url
        assert g.ts_us == w.ts_us  # exact micros, incl. the .123456 row
        assert bytes(g.html or b"") == bytes(w.html or b"")
        assert g.lang == w.lang


def test_roundtrip_plain(spark):
    _roundtrip(spark, gz=False)


def test_roundtrip_gzip_per_record(spark):
    _roundtrip(spark, gz=True)


def test_record_bytes_deterministic_and_cc_shaped():
    r1 = warc_record_py("https://x.test/a", 1_700_000_000_000_000, b"<html/>", "en")
    r2 = warc_record_py("https://x.test/a", 1_700_000_000_000_000, b"<html/>", "en")
    assert r1 == r2  # uuid5 record id, no randomness
    head = r1.split(b"\r\n\r\n", 1)[0].decode()
    assert "WARC-Type: response" in head
    assert "Content-Type: application/http; msgtype=response" in head
    # payload is a full HTTP message, as Common Crawl stores fetches
    assert b"HTTP/1.1 200 OK" in r1


def test_parser_accepts_second_precision_dates_and_skips_non_response():
    # Hand-built foreign record stream: CC-style request+response interleave,
    # WARC-Date without fractional seconds, no language header.
    payload = b"HTTP/1.1 200 OK\r\n\r\n<p>hi</p>"
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: https://cc.test/\r\n"
        b"WARC-Date: 2014-08-02T09:52:13Z\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n" + payload + b"\r\n\r\n"
    )
    req = (
        b"WARC/1.0\r\n"
        b"WARC-Type: request\r\n"
        b"WARC-Target-URI: https://cc.test/\r\n"
        b"WARC-Date: 2014-08-02T09:52:13Z\r\n"
        b"Content-Length: 2\r\n\r\nGE\r\n\r\n"
    )
    from graphiti_spark.sources.warc import _records_to_rows

    rows = _records_to_rows(req + rec, gzip_per_record=False)
    assert len(rows) == 1
    url, ts_us, html, lang = rows[0]
    assert url == "https://cc.test/"
    epoch = datetime(1970, 1, 1)
    assert ts_us == int((datetime(2014, 8, 2, 9, 52, 13) - epoch).total_seconds()) * 1_000_000
    assert html == b"<p>hi</p>"
    assert lang is None


def test_malformed_stream_raises():
    with pytest.raises(ValueError):
        list(_iter_warc_records(b"NOT-A-WARC\r\n\r\n"))
