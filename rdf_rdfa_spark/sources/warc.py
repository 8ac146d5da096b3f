"""WARC → pages connector (ISO 28500; the Common Crawl layout).

Scale design: WARC files are the unit of parallelism — `binaryFile`
gives one row per file and `mapInPandas` parses records inside the
executor, so a crawl segment of thousands of .warc.gz files fans out
with zero driver involvement and no shuffle before the parse. Records
are parsed from the raw bytes (multi-member gzip or plain), response
records paired with their HTTP payload, and non-HTML responses
dropped as early as possible (the content-type filter runs before any
body decoding).

The WARC grammar implemented here is the public ISO 28500 core:
``WARC/1.x`` version line, CRLF header block, Content-Length payload,
CRLF CRLF record separator. Common Crawl's per-record gzip members
concatenate into one stream that :func:`gzip.decompress` handles
natively (it walks members).
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_CRLF2 = b"\r\n\r\n"


def _split_headers(block: bytes) -> dict:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # [0] is the version/status line
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1"))
    return headers


def parse_warc_records(data: bytes) -> Iterator[dict]:
    """Yield {headers, payload} per WARC record. Accepts plain or
    (multi-member) gzip bytes."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if not data[pos:pos + 5] == b"WARC/":
            break
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            break
        headers = _split_headers(data[pos:hdr_end])
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            break
        body_start = hdr_end + 4
        yield {"headers": headers,
               "payload": data[body_start:body_start + length]}
        pos = body_start + length


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer encoding (crawlers store
    the raw wire bytes, so chunked bodies are common in real WARCs).
    Malformed chunking returns the bytes as-is — a page is better
    parsed approximately than dropped."""
    out = []
    pos = 0
    try:
        while True:
            eol = body.index(b"\r\n", pos)
            size = int(body[pos:eol].split(b";")[0], 16)
            if size == 0:
                break
            start = eol + 2
            out.append(body[start:start + size])
            pos = start + size + 2  # skip chunk CRLF
    except (ValueError, IndexError):
        return body
    return b"".join(out)


def _http_body(payload: bytes) -> tuple[bytes | None, str | None]:
    """HTTP response payload → (body, content_type); (None, None) when
    it isn't an HTTP response. Chunked transfer encoding and gzip
    content encoding are undone (raw wire capture)."""
    if not payload[:5] == b"HTTP/":
        return None, None
    sep = payload.find(_CRLF2)
    if sep < 0:
        return None, None
    headers = _split_headers(payload[:sep])
    body = payload[sep + 4:]
    if "chunked" in headers.get("transfer-encoding", ""):
        body = _dechunk(body)
    if headers.get("content-encoding", "").strip() in ("gzip", "x-gzip") \
            and body[:2] == b"\x1f\x8b":
        try:
            body = gzip.decompress(body)
        except OSError:
            pass
    return body, headers.get("content-type")


def warc_bytes_to_pages(data: bytes, html_only: bool = True):
    """One WARC file's bytes → list of page dicts (url, warc_ts, html).
    Pure function — shared by the Spark connector and unit tests."""
    pages = []
    for rec in parse_warc_records(data):
        h = rec["headers"]
        if h.get("warc-type") != "response":
            continue
        url = h.get("warc-target-uri")
        if not url:
            continue
        body, ctype = _http_body(rec["payload"])
        if body is None:
            # a bare-payload response record (e.g. WET-style); keep it
            body = rec["payload"]
            ctype = h.get("content-type")
        if html_only and ctype is not None and "html" not in ctype:
            continue
        pages.append({
            "url": url,
            "warc_ts": pd.Timestamp(h.get("warc-date"))
            .tz_localize(None) if h.get("warc-date") else None,
            "html": body,
        })
    return pages


def read_warc_pages(spark: SparkSession, path: str,
                    html_only: bool = True) -> DataFrame:
    """WARC file glob → pages(url, warc_ts, html, text, lang).

    `text`/`lang` are NULL here (they come from extract_text /
    lang-id downstream); the columns exist so every source lands on
    the same input_hint schema."""
    files = spark.read.format("binaryFile").load(path)

    def gen(batches):
        for pdf in batches:
            out = []
            for content in pdf["content"]:
                out.extend(warc_bytes_to_pages(bytes(content), html_only))
            df = pd.DataFrame(out, columns=["url", "warc_ts", "html"])
            df["text"] = None
            df["lang"] = None
            yield df

    return files.select("content").mapInPandas(
        gen,
        schema=("url string, warc_ts timestamp, html binary, "
                "text string, lang string"),
    )
