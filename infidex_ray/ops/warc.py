"""WARC crawl-archive ingest: parse WARC/1.0 response records from binary
payloads into typed rows — the first stage of every Common-Crawl-shaped
pipeline (WARC → url/status/content-type/body → html_extract → gates).

Pure stdlib (no warcio in this container): records are located by walking
``Content-Length`` byte counts — never by pattern-splitting — so bodies
containing ``WARC/1.0`` or header-like lines parse correctly. The HTTP
block inside each response record is parsed the same way (status line +
headers + body).

Scale shape: one binary column streams through ``map_batches``; each blob
(typically one WARC *file* of many records at real scale) expands to one
row per response record. Parsing is per-record Python by necessity (byte
protocol walking, same precedent as ops/codecs.py); everything downstream
is Arrow. ``build_warc_record`` is the deterministic synthesizer used by
tests and the contract fixture — round-tripping through REAL bytes means
the Content-Length arithmetic (multi-byte UTF-8 included) is part of the
hash-checked contract.

No reference-engine analogue (beyond-reference ingest op).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["build_warc_record", "parse_warc_batch", "warc_extract"]

_CRLF = b"\r\n"


def build_warc_record(
    uri: str,
    date: str,
    body: bytes,
    status: int = 200,
    content_type: str = "text/plain; charset=utf-8",
) -> bytes:
    """One WARC/1.0 ``response`` record wrapping an HTTP/1.1 response."""
    http = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("ascii") + body
    headers = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode("ascii")
    return headers + http + _CRLF + _CRLF


def _parse_headers(blob: bytes, pos: int) -> tuple[dict, int]:
    """Parse CRLF header lines until the blank line; returns (headers,
    position after the blank line). Keys are lowercased."""
    headers: dict[str, str] = {}
    while True:
        end = blob.index(_CRLF, pos)
        line = blob[pos:end]
        pos = end + 2
        if not line:
            return headers, pos
        sep = line.index(b":")
        headers[line[:sep].strip().lower().decode("ascii", "replace")] = (
            line[sep + 1 :].strip().decode("ascii", "replace")
        )


def parse_warc_records(blob: bytes) -> list[dict]:
    """All WARC records in ``blob`` (Content-Length walking). Each row:
    warc_type, uri, date, status (int, -1 if not an HTTP block),
    content_type, body (bytes)."""
    out = []
    pos = 0
    n = len(blob)
    while pos < n:
        # skip inter-record CRLFs
        while blob.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        end = blob.index(_CRLF, pos)
        version = blob[pos:end]
        if not version.startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line at byte {pos}: {version!r}")
        headers, pos = _parse_headers(blob, end + 2)
        length = int(headers["content-length"])
        block = blob[pos : pos + length]
        pos += length
        status, ctype, body = -1, headers.get("content-type", ""), block
        if block.startswith(b"HTTP/"):
            line_end = block.index(_CRLF)
            parts = block[:line_end].split(b" ", 2)
            status = int(parts[1])
            hh, body_pos = _parse_headers(block, line_end + 2)
            ctype = hh.get("content-type", "")
            body = block[body_pos:]
        out.append(
            {
                "warc_type": headers.get("warc-type", ""),
                "uri": headers.get("warc-target-uri", ""),
                "date": headers.get("warc-date", ""),
                "status": status,
                "content_type": ctype,
                "body": body,
            }
        )
    return out


def parse_warc_batch(batch: pa.Table, payload_col: str = "payload") -> pa.Table:
    """map_batches fn: explode each binary WARC blob into one row per
    record. Output: (warc_type, uri, date, status, content_type,
    n_body_bytes, body)."""
    rows = {
        "warc_type": [],
        "uri": [],
        "date": [],
        "status": [],
        "content_type": [],
        "n_body_bytes": [],
        "body": [],
    }
    col = batch[payload_col]
    for blob in col.to_pylist():
        if blob is None:
            continue
        for r in parse_warc_records(blob):
            rows["warc_type"].append(r["warc_type"])
            rows["uri"].append(r["uri"])
            rows["date"].append(r["date"])
            rows["status"].append(r["status"])
            rows["content_type"].append(r["content_type"])
            rows["n_body_bytes"].append(len(r["body"]))
            rows["body"].append(r["body"])
    return pa.table(
        {
            "warc_type": pa.array(rows["warc_type"], pa.string()),
            "uri": pa.array(rows["uri"], pa.string()),
            "date": pa.array(rows["date"], pa.string()),
            "status": pa.array(rows["status"], pa.int64()),
            "content_type": pa.array(rows["content_type"], pa.string()),
            "n_body_bytes": pa.array(rows["n_body_bytes"], pa.int64()),
            "body": pa.array(rows["body"], pa.binary()),
        }
    )


def warc_extract(ds, payload_col: str = "payload", text_body: bool = True):
    """Parse a Dataset of WARC blobs into per-record rows; with
    ``text_body`` the body is additionally UTF-8-decoded to ``body_text``
    (errors replaced) for downstream text gates."""

    def fn(batch: pa.Table) -> pa.Table:
        t = parse_warc_batch(batch, payload_col)
        if not text_body:
            return t
        txt = pa.array(
            [
                b.decode("utf-8", "replace") if b is not None else None
                for b in t["body"].to_pylist()
            ],
            pa.string(),
        )
        return t.drop_columns(["body"]).append_column("body_text", txt)

    return ds.map_batches(fn, batch_format="pyarrow")
