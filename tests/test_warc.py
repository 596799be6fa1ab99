"""WARC ingestion: crafted multi-record files (plain + per-record gzip),
Content-Length splitting with embedded magic bytes, HTTP envelope split,
truncation tolerance, and the end-to-end WARC → html_to_text pipeline."""

from __future__ import annotations

import gzip
import os

from volga_spark.sources.warc import (
    parse_warc_records,
    read_warc,
    response_bodies,
    split_http_payload,
)


def _record(rtype: str, uri: str, payload: bytes, rid: str = "<urn:uuid:x>") -> bytes:
    hdr = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Record-ID: {rid}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return hdr + payload + b"\r\n\r\n"


def _http(body: bytes, ctype: str = "text/html") -> bytes:
    return (
        f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


HTML1 = b"<html><body><p>Hello archived world.</p></body></html>"
# payload containing the record magic — must NOT split the record
HTML2 = b"<html><body>WARC/1.0 is mentioned here\r\n\r\ntwice</body></html>"


def _warc_bytes() -> bytes:
    return (
        _record("warcinfo", "", b"software: test\r\n")
        + _record("response", "https://a.example/1", _http(HTML1))
        + _record("response", "https://b.example/2", _http(HTML2))
        + _record("request", "https://a.example/1", b"GET /1 HTTP/1.1\r\n")
    )


def test_parse_records_plain_and_gzip():
    raw = _warc_bytes()
    for blob in (raw, b"".join(gzip.compress(raw[i : i + 200]) for i in range(0, len(raw), 200))):
        recs = parse_warc_records(blob)
        assert [r["record_type"] for r in recs] == [
            "warcinfo", "response", "response", "request",
        ]
        assert recs[1]["target_uri"] == "https://a.example/1"
        assert recs[2]["payload"].endswith(HTML2)  # embedded magic intact
        assert all(r["content_length"] == len(r["payload"]) for r in recs)


def test_truncation_and_garbage_tolerated():
    raw = _warc_bytes()
    assert len(parse_warc_records(raw[: len(raw) // 2])) >= 1  # clean stop
    assert parse_warc_records(b"not a warc file") == []
    assert parse_warc_records(b"") == []


def test_split_http_payload():
    headers, body = split_http_payload(_http(HTML1))
    assert headers["status"].startswith("HTTP/1.1 200")
    assert headers["content-type"] == "text/html"
    assert body == HTML1
    # non-HTTP payload passes through
    h2, b2 = split_http_payload(b"raw bytes")
    assert h2 == {} and b2 == b"raw bytes"


def test_read_warc_to_curated_text(spark, tmp_path):
    p = tmp_path / "crawl"
    os.makedirs(p)
    (p / "seg0.warc").write_bytes(_warc_bytes())
    (p / "seg1.warc.gz").write_bytes(gzip.compress(_warc_bytes()))

    records = read_warc(spark, str(p))
    assert records.count() == 8  # 4 records × 2 files
    by_type = {
        r["record_type"]: r["cnt"]
        for r in records.groupBy("record_type").count().withColumnRenamed("count", "cnt").collect()
    }
    assert by_type == {"warcinfo": 2, "response": 4, "request": 2}

    bodies = response_bodies(records)
    rows = bodies.collect()
    assert len(rows) == 4
    assert all(r["http_status"].startswith("HTTP/1.1 200") for r in rows)

    # straight into the curation tier: html_to_text over the WARC bodies
    from volga_spark.operators.text import html_to_text

    texts = {
        (r["target_uri"], r["text"].strip())
        for r in bodies.select(
            "target_uri", html_to_text("text").alias("text")
        ).collect()
    }
    assert ("https://a.example/1", "Hello archived world.") in texts


def test_corrupt_gzip_member_quarantined_not_raised():
    """A corrupt gzip member mid-file yields the records decoded before it
    instead of propagating zlib.error into the Spark task (per-file
    quarantine contract)."""
    raw = _warc_bytes()
    half = len(raw) // 2
    good = gzip.compress(raw[:half])
    bad = b"\x1f\x8b" + b"\x00" * 32  # gzip magic, garbage member
    tail = gzip.compress(raw[half:])
    recs = parse_warc_records(good + bad + tail)
    # everything before the corrupt member parses; nothing raises
    assert len(recs) >= 1
    assert recs[0]["record_type"] == "warcinfo"
    # fully-corrupt single member: empty, not an exception
    assert parse_warc_records(b"\x1f\x8b" + b"\xff" * 16) == []
