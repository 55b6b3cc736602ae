"""WARC source — serialize and parse Common-Crawl-style WARC response records.

The north-star corpus is Common Crawl, whose on-disk format is WARC
(ISO 28500): each crawl shard is a file of concatenated `response` records,
one per fetched page, optionally gzip-compressed *per record* (member-
concatenated .warc.gz, so a reader can seek to any member and inflate it
alone). The reference pipeline ingests pre-extracted episode text
(/root/reference/graphiti_core/nodes.py:224-234 — EpisodicNode.content); this
module is the step in front of it that a web-scale deployment needs: turn
WARC shard bytes into the input_hint table ``pages(url, warc_ts, html,
lang)`` that S1 (operators/extract_text.py) consumes.

Record layout emitted/parsed (the subset Common Crawl uses for responses):

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Target-URI: <url>\r\n
    WARC-Date: <ISO-8601, microsecond precision>\r\n
    WARC-Record-ID: <urn:uuid:...>\r\n
    WARC-Identified-Content-Language: <lang>\r\n    (CC's language header)
    Content-Type: application/http; msgtype=response\r\n
    Content-Length: <n>\r\n
    \r\n
    HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n\r\n<html bytes>
    \r\n\r\n

The payload is a full HTTP response message (status line + headers + body),
exactly as Common Crawl stores fetches; the parser strips the HTTP envelope
and returns the body bytes. Parsing never scans for magic strings inside
payloads — it walks ``Content-Length``, so html containing the literal text
"WARC/1.0" round-trips correctly.

Execution shape at 100 TB: a crawl is millions of ~1 GB .warc.gz shards.
Read them with ``spark.read.format("binaryFile")`` (one row per shard) or a
(file_id, warc) parquet manifest, then ``parse_warc_files`` — a map-only
``mapInPandas`` with no shuffle; downstream stages repartition by url hash as
usual. Per-record gzip (``gzip_per_record=True``) is what makes the map side
work: a whole-file-gzip WARC would force single-threaded inflation of each
shard, while member-gzip lets the iterator stream records without holding
the inflated shard in memory. Timestamps travel as integer epoch-micros
through the UDF boundary (never locale-shaped strings), converted by
``F.timestamp_micros`` plan-side — byte-deterministic at any parallelism.
"""

from __future__ import annotations

import gzip
import uuid
from datetime import datetime, timedelta
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StringType, StructField, StructType

from graphiti_spark.session import session_pandas_udf

_EPOCH = datetime(1970, 1, 1)
_CRLF = b"\r\n"
_HTTP_HEAD = b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n\r\n"


def _warc_date(ts_us: int) -> str:
    """Epoch-micros -> WARC-Date. Microsecond precision (WARC 1.1 allows
    sub-second digits; CC emits seconds — the parser accepts both)."""
    dt = _EPOCH + timedelta(microseconds=int(ts_us))
    return dt.strftime("%Y-%m-%dT%H:%M:%S.%fZ")


def _parse_warc_date(s: str) -> int:
    """WARC-Date -> epoch micros. Accepts second- and fraction-precision."""
    s = s.strip()
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in s else "%Y-%m-%dT%H:%M:%SZ"
    return int((datetime.strptime(s, fmt) - _EPOCH) / timedelta(microseconds=1))


def warc_record_py(url: str, ts_us: int, html: bytes, lang: str | None) -> bytes:
    """One WARC/1.0 response record. Pure function of its arguments
    (Record-ID is uuid5 of url+ts, not random) — identical bytes at any
    parallelism, which is what lets the round-trip be oracle-checked."""
    payload = _HTTP_HEAD + (html or b"")
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{url}@{ts_us}")
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {_warc_date(ts_us)}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        + (f"WARC-Identified-Content-Language: {lang}\r\n" if lang else "")
        + f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("utf-8")
    return headers + payload + _CRLF + _CRLF


@session_pandas_udf(BinaryType())
def _warc_record_udf(
    url: pd.Series, ts_us: pd.Series, html: pd.Series, lang: pd.Series
) -> pd.Series:
    return pd.Series(
        [
            warc_record_py(u, int(t), h if h is not None else b"", l)
            for u, t, h, l in zip(url, ts_us, html, lang)
        ],
        dtype=object,
    )


def to_warc_records(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html[, lang]) -> (url, record: binary).

    Map-only (one Arrow-batched UDF, no shuffle); epoch-micros cross the
    UDF boundary, never locale-dependent timestamp strings."""
    lang = F.col("lang") if "lang" in pages.columns else F.lit(None).cast("string")
    return pages.select(
        "url",
        _warc_record_udf(
            F.col("url"), F.unix_micros(F.col("warc_ts")), F.col("html"), lang
        ).alias("record"),
    )


def pack_warc_files(
    records: DataFrame, n_files: int = 16, gzip_per_record: bool = False
) -> DataFrame:
    """(url, record) -> (file_id, warc): concatenate records into n_files
    shard blobs, Common Crawl's member-concatenated layout.

    Deterministic: file assignment is a pure hash of url; within a file,
    records are concatenated in url order. One shuffle (groupBy file_id);
    at real scale n_files = corpus_bytes / ~1 GB so each task materializes
    one shard — the same bound a crawler's writer honors.
    """
    out_schema = StructType(
        [StructField("file_id", LongType()), StructField("warc", BinaryType())]
    )

    def _concat(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("url")
        blobs = pdf["record"]
        if gzip_per_record:
            # mtime=0: gzip member bytes must be pure functions of content.
            blobs = [gzip.compress(bytes(r), 6, mtime=0) for r in blobs]
        return pd.DataFrame(
            {"file_id": [int(pdf["file_id"].iloc[0])], "warc": [b"".join(blobs)]}
        )

    keyed = records.withColumn(
        "file_id", F.pmod(F.xxhash64("url"), F.lit(n_files)).cast("long")
    )
    return keyed.groupBy("file_id").applyInPandas(_concat, schema=out_schema)


def _iter_warc_records(blob: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (headers, payload) from concatenated WARC/1.0 records. Walks
    Content-Length — payload bytes are opaque (may contain 'WARC/1.0')."""
    pos = 0
    n = len(blob)
    while pos < n:
        # Tolerate inter-record padding/newlines (some writers emit extras).
        while pos < n and blob[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        if not blob.startswith(b"WARC/", pos):
            raise ValueError(f"malformed WARC stream at offset {pos}")
        head_end = blob.index(b"\r\n\r\n", pos)
        header_lines = blob[pos:head_end].decode("utf-8").split("\r\n")[1:]
        headers: dict[str, str] = {}
        for ln in header_lines:
            k, _, v = ln.partition(":")
            headers[k.strip().lower()] = v.strip()
        clen = int(headers["content-length"])
        body_start = head_end + 4
        payload = blob[body_start : body_start + clen]
        yield headers, payload
        pos = body_start + clen  # trailing \r\n\r\n handled by the skip above


def _iter_gzip_members(blob: bytes) -> Iterator[bytes]:
    """Inflate member-concatenated gzip (.warc.gz) one member at a time,
    streaming via unused_data — never materializes the whole inflated shard."""
    import zlib

    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        member = d.decompress(blob[pos:])
        yield member
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member made no progress")
        pos += consumed


_PARSED_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("ts_us", LongType()),
        StructField("html", BinaryType()),
        StructField("lang", StringType()),
    ]
)


def _records_to_rows(blob: bytes, gzip_per_record: bool) -> list[tuple]:
    rows = []
    if gzip_per_record:
        streams: Iterator[bytes] = _iter_gzip_members(blob)
    else:
        streams = iter([blob])
    for stream in streams:
        for headers, payload in _iter_warc_records(stream):
            if headers.get("warc-type") != "response":
                continue  # CC shards interleave request/metadata records
            if headers.get("content-type", "").startswith("application/http"):
                # Strip the HTTP envelope: body begins after its blank line.
                sep = payload.find(b"\r\n\r\n")
                payload = payload[sep + 4 :] if sep >= 0 else b""
            rows.append(
                (
                    headers["warc-target-uri"],
                    _parse_warc_date(headers["warc-date"]),
                    payload,
                    headers.get("warc-identified-content-language"),
                )
            )
    return rows


def parse_warc_files(
    files: DataFrame, col: str = "warc", gzip_per_record: bool = False
) -> DataFrame:
    """(.., <col>: binary) shard blobs -> pages(url, warc_ts, html, lang).

    Map-only ``mapInPandas`` (iterator form: one shard inflated at a time
    per task, not one Arrow batch of shards); no shuffle — parallelism is
    the shard count, exactly how a 100 TB crawl parallelizes. Timestamps
    re-enter the plan as ``timestamp_micros(ts_us)``."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf[col]:
                rows = _records_to_rows(bytes(blob), gzip_per_record)
                yield pd.DataFrame(
                    rows, columns=["url", "ts_us", "html", "lang"]
                ).astype({"ts_us": "int64"}) if rows else pd.DataFrame(
                    {
                        "url": pd.Series(dtype=object),
                        "ts_us": pd.Series(dtype="int64"),
                        "html": pd.Series(dtype=object),
                        "lang": pd.Series(dtype=object),
                    }
                )

    parsed = files.mapInPandas(_parse, schema=_PARSED_SCHEMA)
    return parsed.select(
        "url",
        F.timestamp_micros(F.col("ts_us")).alias("warc_ts"),
        "html",
        "lang",
    )
