"""WARC ingestion — the Common Crawl container format, Spark-native.

A 100 TB pretraining corpus usually STARTS as WARC (ISO 28500): the web
archive format Common Crawl publishes — concatenated records, each a
``WARC/1.x`` header block (CRLF-terminated header lines, ``Content-Length``
giving the exact payload byte count) followed by the payload and a blank
line. ``response`` records carry an HTTP envelope inside the payload; the
HTML body behind it is what the curation tier (``operators/text.html_to_text``
→ gates → dedup) consumes.

Spark-first shape: WARC members can't be line-split (payloads are binary
and contain newlines), so files are read whole via the ``binaryFile``
source — one file per task, which matches how Common Crawl shards its
crawls (~1 GB gzipped segments, thousands per crawl: file-level parallelism
IS the parallelism; a 1000-executor cluster maps segments to tasks 1:1).
Records are then split by exact Content-Length arithmetic (never by
scanning for the magic — payloads may contain ``WARC/1.0``) in one
``mapInPandas`` pass per file. gzip members (the .warc.gz framing is
per-record gzip concatenation) are handled transparently by
``zlib`` multi-member decompression.

Record fields surface as typed columns (url, record type, date, content
type, payload bytes); :func:`response_bodies` strips the HTTP envelope and
decodes text so the result drops straight into ``CurationSpec``.
"""

from __future__ import annotations

import io
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

RECORD_SCHEMA = (
    "path string, record_id string, record_type string, target_uri string, "
    "warc_date string, content_type string, content_length bigint, "
    "payload binary"
)


def _gunzip_members(raw: bytes) -> bytes:
    """Decompress concatenated gzip members (the .warc.gz framing: one gzip
    member per record). Plain (uncompressed) input passes through."""
    if len(raw) < 2 or raw[:2] != b"\x1f\x8b":
        return raw
    out = io.BytesIO()
    pos = 0
    while pos < len(raw):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            out.write(d.decompress(raw[pos:]))
        except zlib.error:
            # One corrupt gzip member must not fail the whole Spark task
            # (after retries, the job): keep the members decoded so far —
            # Content-Length framing in parse_warc_records stops cleanly at
            # the truncation point, matching the per-file quarantine
            # contract ("raises nothing").
            break
        consumed = len(raw[pos:]) - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return out.getvalue()


def parse_warc_records(raw: bytes) -> list[dict]:
    """Split one WARC file's bytes into records by Content-Length arithmetic.
    Tolerates trailing garbage / truncation (stops cleanly); raises nothing —
    ingest quarantining happens a level up on a per-file basis."""
    data = _gunzip_members(raw)
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n or not data[pos : pos + 5] == b"WARC/":
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                    "latin-1", "replace"
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        payload = data[body_start : body_start + clen]
        if len(payload) < clen:  # truncated final record
            break
        records.append(
            {
                "record_id": headers.get("warc-record-id", ""),
                "record_type": headers.get("warc-type", ""),
                "target_uri": headers.get("warc-target-uri", ""),
                "warc_date": headers.get("warc-date", ""),
                "content_type": headers.get("content-type", ""),
                "content_length": clen,
                "payload": payload,
            }
        )
        pos = body_start + clen
    return records


def split_http_payload(payload: bytes) -> tuple[dict, bytes]:
    """(http_headers, body) from a response record's payload; records whose
    payload isn't an HTTP envelope come back as ({}, payload)."""
    if not payload[:5] in (b"HTTP/",):
        return {}, payload
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return {}, payload
    headers: dict[str, str] = {}
    lines = payload[:sep].split(b"\r\n")
    headers["status"] = lines[0].decode("latin-1", "replace")
    for line in lines[1:]:
        k, colon, v = line.partition(b":")
        if colon:
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1", "replace"
            )
    return headers, payload[sep + 4 :]


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC records as a DataFrame (one row per record, RECORD_SCHEMA).

    ``binaryFile`` hands each task whole files; record splitting is local
    arithmetic. Driver never touches content; skew follows file sizes, which
    Common Crawl keeps uniform by construction."""
    import volga_spark.sources.warc as _self

    from volga_spark._pickle import register_by_value

    register_by_value(_self)
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, raw in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_records(bytes(raw)):
                    rec["path"] = p
                    rows.append(rec)
            cols = [
                "path", "record_id", "record_type", "target_uri",
                "warc_date", "content_type", "content_length", "payload",
            ]
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(gen, schema=RECORD_SCHEMA)


def response_bodies(
    records: DataFrame, encoding: str = "utf-8"
) -> DataFrame:
    """response-record HTTP bodies decoded to text: (target_uri, warc_date,
    http_status, http_content_type, text). The input to html_to_text →
    CurationSpec. Decode errors replace (curation gates drop mojibake)."""
    from pyspark.sql import functions as F

    import volga_spark.sources.warc as _self

    from volga_spark._pickle import register_by_value

    register_by_value(_self)
    src = records.filter(F.col("record_type") == "response").select(
        "target_uri", "warc_date", "payload"
    )
    schema = (
        "target_uri string, warc_date string, http_status string, "
        "http_content_type string, text string"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "target_uri", "warc_date", "http_status", "http_content_type", "text"
            )}
            for uri, date, payload in zip(
                pdf["target_uri"], pdf["warc_date"], pdf["payload"]
            ):
                headers, body = split_http_payload(bytes(payload))
                out["target_uri"].append(uri)
                out["warc_date"].append(date)
                out["http_status"].append(headers.get("status", ""))
                out["http_content_type"].append(headers.get("content-type", ""))
                out["text"].append(body.decode(encoding, "replace"))
            yield pd.DataFrame(out)

    return src.mapInPandas(gen, schema=schema)
