"""WARC (Web ARChive) demux — record walk + per-record gzip, pure
stdlib.

WARC is THE LLM-corpus source format (Common Crawl ships it): a
sequence of records, each a ``WARC/1.x`` version line, named headers
(WARC-Type, WARC-Target-URI, Content-Length, ...), CRLF CRLF, then
exactly Content-Length payload bytes and CRLF CRLF. Archives are
usually gzipped PER RECORD (multi-member gzip), so members can be
ranged-read independently — this module handles both the plain
concatenation and the per-record-gzip form (via the multi-member
walk in ``functions/archive.parse_gzip``), and for ``response``
records additionally splits the embedded HTTP message: status code,
Content-Type header, and the exact BODY byte range after the blank
line — the text a 100 TB crawl pipeline actually wants.

``body_checksum`` (byte sum of the HTTP body, or the raw block for
non-response records, mod 2^31) pins extraction exactness in the
golden oracle. Containment: corrupt bytes become err rows —
Content-Length is bounds-checked, version lines validated, gzip CRC
verified by the archive walk.

Format follows the public WARC specification (ISO 28500 / IIPC
warc-specifications); no reference code used. Reference surface: ETL
IMPORT/LOAD extended to crawl sources.
"""

from __future__ import annotations

__all__ = ["encode_warc_fixture", "parse_warc", "warc_records"]


def _checksum(data: bytes) -> int:
    return sum(data) % 2147483648


def _parse_record(block: bytes, at_offset: int) -> tuple[dict, int]:
    """Parse one WARC record starting at offset 0 of ``block``; returns
    (record dict, bytes consumed including trailing CRLFCRLF)."""
    eol = block.find(b"\r\n")
    if eol < 0:
        raise ValueError("WARC version line unterminated")
    version = block[:eol]
    if not version.startswith(b"WARC/1."):
        raise ValueError(f"WARC version line malformed: {version[:20]!r}")
    hdr_end = block.find(b"\r\n\r\n", eol)
    if hdr_end < 0:
        raise ValueError("WARC header block unterminated")
    headers: dict[str, str] = {}
    for line in block[eol + 2 : hdr_end].split(b"\r\n"):
        if b":" not in line:
            raise ValueError(f"WARC header line without colon: {line[:30]!r}")
        k, v = line.split(b":", 1)
        headers[k.strip().decode("ascii", "replace").lower()] = (
            v.strip().decode("utf-8", "replace")
        )
    try:
        length = int(headers["content-length"])
    except (KeyError, ValueError):
        raise ValueError("WARC record missing a numeric Content-Length")
    body_at = hdr_end + 4
    if body_at + length > len(block):
        raise ValueError("WARC record block overruns its input")
    payload = block[body_at : body_at + length]
    tail = block[body_at + length : body_at + length + 4]
    if tail[:4] != b"\r\n\r\n":
        raise ValueError("WARC record missing trailing CRLFCRLF")

    rtype = headers.get("warc-type", "")
    status = None
    content_type = headers.get("content-type")
    body = payload
    if rtype == "response" and payload.startswith(b"HTTP/"):
        he = payload.find(b"\r\n\r\n")
        if he < 0:
            raise ValueError("WARC response without HTTP header terminator")
        http_head = payload[:he]
        first = http_head.split(b"\r\n", 1)[0].split()
        if len(first) >= 2 and first[1].isdigit():
            status = int(first[1])
        for line in http_head.split(b"\r\n")[1:]:
            if line.lower().startswith(b"content-type:"):
                content_type = (
                    line.split(b":", 1)[1].strip().decode("latin-1")
                )
        body = payload[he + 4 :]
    return (
        {
            "type": rtype,
            "uri": headers.get("warc-target-uri"),
            "record_id": headers.get("warc-record-id"),
            "content_length": length,
            "content_type": content_type,
            "http_status": status,
            "block_offset": at_offset + body_at,
            "body_bytes": len(body),
            "body_checksum": _checksum(body),
        },
        body_at + length + 4,
    )


def parse_warc(payload: bytes) -> list[dict]:
    """Walk a WARC file — per-record gzip (multi-member) or plain
    concatenation — into one manifest dict per record."""
    records: list[dict] = []
    if payload[:2] == b"\x1f\x8b":
        from pixels_spark.functions.archive import parse_gzip
        import zlib

        # reuse the CRC-verified multi-member walk for member framing,
        # then re-inflate each member for its bytes
        for m in parse_gzip(payload):
            comp = payload[m["offset"] : m["offset"] + m["comp_size"]]
            block = zlib.decompressobj(-15).decompress(comp)
            rec, _used = _parse_record(block, 0)
            rec["gzip_member"] = True
            records.append(rec)
    else:
        pos = 0
        while pos < len(payload):
            if payload[pos : pos + 5] != b"WARC/":
                raise ValueError(
                    f"WARC record boundary expected at offset {pos}"
                )
            rec, used = _parse_record(payload[pos:], pos)
            rec["gzip_member"] = False
            records.append(rec)
            pos += used
    if not records:
        raise ValueError("WARC contains no records")
    return records


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------

def _record(
    rtype: str, uri: str | None, rid: str, payload: bytes
) -> bytes:
    heads = [
        b"WARC/1.0",
        b"WARC-Type: " + rtype.encode(),
        b"WARC-Record-ID: <" + rid.encode() + b">",
        b"WARC-Date: 2020-01-01T00:00:00Z",
    ]
    if uri:
        heads.append(b"WARC-Target-URI: " + uri.encode())
    if rtype == "response":
        heads.append(b"Content-Type: application/http;msgtype=response")
    heads.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(heads) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def encode_warc_fixture(
    n_pages: int = 3, gzip_per_record: bool = True, seed: int = 0
) -> bytes:
    """Deterministic WARC: a warcinfo record, then per page a request +
    response pair (response = embedded HTTP message with status,
    Content-Type and an HTML-ish body), optionally gzipped per record
    (mtime-0 members via ``archive.encode_gzip_fixture`` framing)."""
    recs: list[bytes] = [
        _record(
            "warcinfo",
            None,
            f"urn:fixture:warcinfo:{seed}",
            b"software: pixels-spark-fixture\r\nformat: WARC File Format 1.0",
        )
    ]
    for p in range(n_pages):
        uri = f"urn:fixture:page:{seed}:{p}"
        recs.append(
            _record(
                "request",
                uri,
                f"urn:fixture:req:{seed}:{p}",
                b"GET /page HTTP/1.1\r\nHost: fixture\r\n\r\n",
            )
        )
        body = (
            f"<html><title>Page {p} of {seed}</title><body>"
            f"{'text ' * (20 + 5 * p)}</body></html>"
        ).encode()
        status = 200 if (p + seed) % 4 else 404
        http = (
            f"HTTP/1.1 {status} X\r\n"
            f"Content-Type: text/html; charset=utf-8\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        recs.append(
            _record("response", uri, f"urn:fixture:resp:{seed}:{p}", http)
        )
    if not gzip_per_record:
        return b"".join(recs)
    import struct
    import zlib

    out = bytearray()
    for r in recs:
        out += b"\x1f\x8b\x08\x00" + b"\x00" * 4 + b"\x00\xff"
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        out += co.compress(r) + co.flush()
        out += struct.pack(
            "<II", zlib.crc32(r) & 0xFFFFFFFF, len(r) % (1 << 32)
        )
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark seam
# ---------------------------------------------------------------------------

def synthetic_warc_media(spark, n: int = 12):
    """Deterministic WARC MEDIA_SCHEMA fixture rotating page counts and
    gzip-per-record vs plain forms, ending with a CRC-corrupted gzip
    row and a bad-record-boundary row so the err channel pins."""
    from pixels_spark.functions.multimodal import MEDIA_SCHEMA

    rows = []
    for i in range(n):
        payload = encode_warc_fixture(
            n_pages=1 + (i % 4), gzip_per_record=(i % 2 == 0), seed=i
        )
        if i == n - 1:
            # plain form (11 is odd): clobber the 2nd record boundary
            at = payload.index(b"WARC/1.0", 10)
            payload = payload[:at] + b"XXXX" + payload[at + 4 :]
        elif i == n - 2:
            b = bytearray(payload)  # gzip form (10 is even): flip a byte
            b[40] ^= 0xFF
            payload = bytes(b)
        rows.append((i, "document", payload, "{}"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def warc_records(media) -> "object":
    """Arrow-batched WARC walk over a MEDIA_SCHEMA DataFrame: one row
    per RECORD with type/URI/status/content accounting and the body
    checksum; malformed archives become one err row each."""
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from pixels_spark.functions.multimodal import DECODE_ERRORS

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("rec_type", StringType()),
            StructField("uri", StringType()),
            StructField("record_id", StringType()),
            StructField("content_length", LongType()),
            StructField("content_type", StringType()),
            StructField("http_status", LongType()),
            StructField("body_bytes", LongType()),
            StructField("body_checksum", LongType()),
            StructField("gzip_member", BooleanType()),
            StructField("err", StringType()),
        ]
    )
    cols = [f.name for f in schema.fields]

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    for r in parse_warc(bytes(payload)):
                        rows.append(
                            {
                                "media_id": mid,
                                "rec_type": r["type"],
                                "uri": r["uri"],
                                "record_id": r["record_id"],
                                "content_length": r["content_length"],
                                "content_type": r["content_type"],
                                "http_status": r["http_status"],
                                "body_bytes": r["body_bytes"],
                                "body_checksum": r["body_checksum"],
                                "gzip_member": r["gzip_member"],
                                "err": None,
                            }
                        )
                except DECODE_ERRORS as e:
                    row = dict.fromkeys(cols)
                    row["media_id"] = mid
                    row["err"] = f"{type(e).__name__}: {e}"
                    rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, schema=schema)
