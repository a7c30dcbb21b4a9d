"""PDF demux + text extraction — xref walk, object parse, FlateDecode
content streams, pure stdlib.

PDFs are the dominant document format of real LLM training corpora;
a 100 TB document ingest needs (a) structural metadata — version,
object count, page count, Info dictionary — and (b) the TEXT, before
any heavier OCR tier. Both are recoverable with stdlib tools for the
classic-PDF subset this module targets:

- header version, classic xref TABLES (with /Prev chains) and the
  trailer's /Root and /Info references;
- the Catalog -> /Pages tree walked recursively to an exact page
  count (intermediate /Pages nodes with /Kids, leaf /Page objects);
- the /Info dictionary's Title/Author/Producer strings;
- each page's /Contents stream — FlateDecoded via stdlib zlib when
  filtered — tokenized for text-showing operators (``Tj``, ``'``,
  and the array form ``TJ``), with PDF string escapes (octal, \\n,
  \\( ...) unescaped.

Out of scope, documented: xref STREAMS (PDF 1.5 compressed xref) and
object streams raise NotImplementedError; encrypted files (/Encrypt)
report metadata with NULL text fields. The text checksum pins
extraction exactness in the golden oracle, the GIF/archive
convention. Containment (the MP4 rule): corrupt bytes become err
rows — offsets bounds-checked, zlib errors normalize to ValueError.

Format follows the public PDF specification (ISO 32000-1, freely
published by Adobe); no reference code used. Reference surface: ETL
IMPORT/LOAD extended to document sources.

Scale: one xref walk + per-page inflate inside the Arrow batch that
carries the payload — embarrassingly parallel across the corpus.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["encode_pdf_fixture", "parse_pdf"]

_MAX_STREAM = 64 << 20


def _checksum(data: bytes) -> int:
    return sum(data) % 2147483648


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")


def _find_objects(payload: bytes) -> dict[int, int]:
    """Object number -> byte offset, from the classic xref table chain
    (with a raw-scan fallback for files whose xref is damaged)."""
    at = payload.rfind(b"startxref")
    if at < 0:
        raise ValueError("PDF missing startxref")
    m = re.search(rb"startxref\s+(\d+)", payload[at:])
    if not m:
        raise ValueError("PDF startxref offset unreadable")
    xref_at = int(m.group(1))
    offsets: dict[int, int] = {}
    seen = set()
    while xref_at:
        if xref_at in seen:
            raise ValueError("PDF xref chain loops")
        seen.add(xref_at)
        if xref_at >= len(payload):
            raise ValueError("PDF xref offset beyond payload")
        if not payload[xref_at : xref_at + 4].startswith(b"xref"):
            raise NotImplementedError(
                "PDF xref streams (1.5 compressed xref) not supported — "
                "classic xref tables only"
            )
        pos = xref_at + 4
        while True:
            m = re.match(rb"\s*(\d+)\s+(\d+)\s*", payload[pos : pos + 64])
            if not m:
                break
            start, count = int(m.group(1)), int(m.group(2))
            pos += m.end()
            for i in range(count):
                entry = payload[pos : pos + 20]
                if len(entry) < 18:
                    raise ValueError("PDF xref entry truncated")
                off = int(entry[:10])
                kind = entry[17:18]
                num = start + i
                if kind == b"n" and num not in offsets:
                    offsets[num] = off
                pos += 20
        tm = re.search(rb"trailer", payload[pos : pos + 256])
        if tm is None:
            break
        # bound the trailer to ITS OWN balanced << >> — a flat 2 KiB
        # slice would read past it into an appended incremental
        # update's trailer and pick up that one's /Prev instead
        tdict = _dict_of(payload[pos + tm.end() : pos + tm.end() + 2048])
        pm = re.search(rb"/Prev\s+(\d+)", tdict)
        xref_at = int(pm.group(1)) if pm else 0
    if not offsets:
        raise ValueError("PDF xref yielded no objects")
    return offsets


def _object_body(payload: bytes, off: int) -> bytes:
    if off >= len(payload):
        raise ValueError("PDF object offset beyond payload")
    m = _OBJ_RE.match(payload, off)
    if not m:
        # tolerate leading whitespace before "N G obj"
        m = _OBJ_RE.search(payload, off, off + 32)
        if not m:
            raise ValueError(f"PDF object header missing at offset {off}")
    end = payload.find(b"endobj", m.end())
    if end < 0:
        raise ValueError("PDF object without endobj")
    return payload[m.end() : end]


def _dict_of(body: bytes) -> bytes:
    at = body.find(b"<<")
    if at < 0:
        return b""
    depth = 0
    i = at
    while i < len(body) - 1:
        two = body[i : i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return body[at:i]
        else:
            i += 1
    raise ValueError("PDF dictionary unbalanced")


def _ref(d: bytes, key: bytes) -> int | None:
    m = re.search(rb"/" + key + rb"\s+(\d+)\s+\d+\s+R", d)
    return int(m.group(1)) if m else None


def _name_is(d: bytes, key: bytes, value: bytes) -> bool:
    return re.search(rb"/" + key + rb"\s*/" + value + rb"\b", d) is not None


def _pdf_string(d: bytes, key: bytes) -> str | None:
    m = re.search(rb"/" + key + rb"\s*\(", d)
    if not m:
        return None
    out = bytearray()
    i = m.end()
    depth = 1
    while i < len(d) and depth:
        c = d[i : i + 1]
        if c == b"\\" and i + 1 < len(d):
            nxt = d[i + 1 : i + 2]
            esc = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"(": b"(",
                   b")": b")", b"\\": b"\\"}
            if nxt in esc:
                out += esc[nxt]
                i += 2
                continue
            om = re.match(rb"[0-7]{1,3}", d[i + 1 : i + 4])
            if om:
                out.append(int(om.group(0), 8) & 0xFF)
                i += 1 + om.end()
                continue
            i += 1
            continue
        if c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                break
        out += c
        i += 1
    return out.decode("latin-1")


def _count_pages(payload: bytes, offsets: dict[int, int], node: int,
                 depth: int = 0) -> list[int]:
    """Walk the /Pages tree; return leaf /Page object numbers."""
    if depth > 32:
        raise ValueError("PDF /Pages tree too deep (loop?)")
    body = _object_body(payload, offsets[node])
    d = _dict_of(body)
    if _name_is(d, b"Type", b"Page"):
        return [node]
    kids = re.search(rb"/Kids\s*\[(.*?)\]", d, re.S)
    if not kids:
        raise ValueError("PDF /Pages node without /Kids")
    leaves: list[int] = []
    for m in _REF_RE.finditer(kids.group(1)):
        child = int(m.group(1))
        if child not in offsets:
            raise ValueError(f"PDF /Kids reference {child} not in xref")
        leaves += _count_pages(payload, offsets, child, depth + 1)
    return leaves


def _stream_data(payload: bytes, offsets: dict[int, int], num: int) -> bytes:
    body = _object_body(payload, offsets[num])
    d = _dict_of(body)
    at = body.find(b"stream")
    if at < 0:
        raise ValueError("PDF /Contents object has no stream")
    at += len(b"stream")
    if body[at : at + 2] == b"\r\n":
        at += 2
    elif body[at : at + 1] == b"\n":
        at += 1
    end = body.rfind(b"endstream")
    if end < 0:
        raise ValueError("PDF stream without endstream")
    data = body[at:end].rstrip(b"\r\n")
    if re.search(rb"/Filter\s*/FlateDecode\b", d):
        try:
            data = zlib.decompressobj().decompress(data, _MAX_STREAM)
        except zlib.error as exc:
            raise ValueError(f"PDF FlateDecode error: {exc}")
    elif re.search(rb"/Filter", d):
        raise NotImplementedError(
            "PDF stream filter beyond FlateDecode (DCT/LZW/ASCII85) "
            "not supported"
        )
    return data


_TJ_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)\s*(?:Tj|')|\[((?:[^\[\]\\]|\\.)*)\]\s*TJ")
_STR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)")


def _unescape(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            esc = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"(": b"(",
                   b")": b")", b"\\": b"\\"}
            if nxt in esc:
                out += esc[nxt]
                i += 2
                continue
            om = re.match(rb"[0-7]{1,3}", raw[i + 1 : i + 4])
            if om:
                out.append(int(om.group(0), 8) & 0xFF)
                i += 1 + om.end()
                continue
            i += 1
            continue
        out += c
        i += 1
    return out.decode("latin-1")


def _extract_text(content: bytes) -> str:
    parts: list[str] = []
    for m in _TJ_RE.finditer(content):
        seg = m.group(0)
        for sm in _STR_RE.finditer(seg):
            parts.append(_unescape(sm.group(1)))
    return "".join(parts)


def parse_pdf(payload: bytes) -> dict:
    """Classic-PDF walk: version, xref object map, page count via the
    /Pages tree, Info strings, per-page FlateDecoded content text.
    Encrypted files report metadata with None text. Raises ValueError /
    NotImplementedError on malformed or out-of-subset structure."""
    m = re.match(rb"%PDF-(\d+\.\d+)", payload)
    if not m:
        raise ValueError("not a PDF payload (missing %PDF- header)")
    version = m.group(1).decode("ascii")
    offsets = _find_objects(payload)

    t_at = payload.rfind(b"trailer")
    if t_at < 0:
        raise ValueError("PDF missing trailer")
    trailer = payload[t_at : t_at + 2048]
    encrypted = b"/Encrypt" in trailer
    root = _ref(trailer, b"Root")
    if root is None or root not in offsets:
        raise ValueError("PDF trailer /Root missing or dangling")
    info = _ref(trailer, b"Info")

    cat = _dict_of(_object_body(payload, offsets[root]))
    pages_root = _ref(cat, b"Pages")
    if pages_root is None or pages_root not in offsets:
        raise ValueError("PDF catalog /Pages missing or dangling")
    page_objs = _count_pages(payload, offsets, pages_root)

    title = author = producer = None
    if info is not None and info in offsets:
        idict = _dict_of(_object_body(payload, offsets[info]))
        title = _pdf_string(idict, b"Title")
        author = _pdf_string(idict, b"Author")
        producer = _pdf_string(idict, b"Producer")

    text = None
    if not encrypted:
        chunks: list[str] = []
        for pnum in page_objs:
            pd = _dict_of(_object_body(payload, offsets[pnum]))
            cref = _ref(pd, b"Contents")
            if cref is None or cref not in offsets:
                continue
            chunks.append(_extract_text(_stream_data(payload, offsets, cref)))
        text = "\n".join(chunks)

    return {
        "version": version,
        "n_objects": len(offsets),
        "n_pages": len(page_objs),
        "encrypted": encrypted,
        "title": title,
        "author": author,
        "producer": producer,
        "text": text,
        "text_chars": len(text) if text is not None else None,
        "text_checksum": (
            _checksum(text.encode("latin-1", "replace"))
            if text is not None
            else None
        ),
    }


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------

def encode_pdf_fixture(
    n_pages: int = 2,
    compress: bool = True,
    title: str = "Fixture",
    incremental_update: bool = False,
    nested_pages: bool = False,
    seed: int = 0,
) -> bytes:
    """Deterministic classic PDF: header, catalog, /Pages tree
    (optionally nested), per-page FlateDecoded content streams with Tj/
    TJ text, Info dict, xref table + trailer (optionally an incremental
    update appending a second xref with /Prev)."""
    objs: dict[int, bytes] = {}
    n = 1
    catalog_num = n; n += 1
    pages_num = n; n += 1
    info_num = n; n += 1

    page_nums = []
    content_nums = []
    for p in range(n_pages):
        page_nums.append(n); n += 1
        content_nums.append(n); n += 1

    inner_num = None
    if nested_pages and n_pages >= 2:
        inner_num = n; n += 1

    objs[catalog_num] = (
        b"<< /Type /Catalog /Pages " + str(pages_num).encode() + b" 0 R >>"
    )
    if inner_num is not None:
        first = page_nums[0]
        rest = page_nums[1:]
        objs[pages_num] = (
            b"<< /Type /Pages /Kids ["
            + str(first).encode() + b" 0 R "
            + str(inner_num).encode() + b" 0 R ] /Count "
            + str(n_pages).encode() + b" >>"
        )
        objs[inner_num] = (
            b"<< /Type /Pages /Kids ["
            + b" ".join(str(r).encode() + b" 0 R" for r in rest)
            + b"] /Count " + str(len(rest)).encode() + b" >>"
        )
        parent_of = {first: pages_num, **{r: inner_num for r in rest}}
    else:
        objs[pages_num] = (
            b"<< /Type /Pages /Kids ["
            + b" ".join(str(r).encode() + b" 0 R" for r in page_nums)
            + b"] /Count " + str(n_pages).encode() + b" >>"
        )
        parent_of = {r: pages_num for r in page_nums}

    for p, (pnum, cnum) in enumerate(zip(page_nums, content_nums)):
        objs[pnum] = (
            b"<< /Type /Page /Parent "
            + str(parent_of[pnum]).encode()
            + b" 0 R /MediaBox [0 0 612 792] /Contents "
            + str(cnum).encode() + b" 0 R >>"
        )
        line1 = f"Page {p + 1} of fixture {seed} \\(escaped\\)".encode()
        content = (
            b"BT /F1 12 Tf 72 720 Td (" + line1 + b") Tj "
            b"0 -14 Td [(array) -250 (form p" + str(p).encode()
            + b")] TJ ET"
        )
        if compress:
            z = zlib.compress(content, 9)
            objs[cnum] = (
                b"<< /Length " + str(len(z)).encode()
                + b" /Filter /FlateDecode >>\nstream\n" + z + b"\nendstream"
            )
        else:
            objs[cnum] = (
                b"<< /Length " + str(len(content)).encode()
                + b" >>\nstream\n" + content + b"\nendstream"
            )

    objs[info_num] = (
        b"<< /Title (" + title.encode() + b") /Author (pixels-spark)"
        b" /Producer (fixture \\050v1\\051) >>"
    )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += str(num).encode() + b" 0 obj\n" + objs[num] + b"\nendobj\n"

    xref_at = len(out)
    max_num = max(objs)
    out += b"xref\n0 " + str(max_num + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for num in range(1, max_num + 1):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(max_num + 1).encode()
        + b" /Root " + str(catalog_num).encode() + b" 0 R /Info "
        + str(info_num).encode() + b" 0 R >>\nstartxref\n"
        + str(xref_at).encode() + b"\n%%EOF\n"
    )

    if incremental_update:
        # append a replacement Info object + a second xref with /Prev
        new_info = (
            b"<< /Title (" + title.encode() + b" v2) /Author (pixels-spark)"
            b" /Producer (fixture) >>"
        )
        upd_off = len(out)
        out += str(info_num).encode() + b" 0 obj\n" + new_info + b"\nendobj\n"
        x2 = len(out)
        out += b"xref\n" + str(info_num).encode() + b" 1\n"
        out += f"{upd_off:010d} 00000 n \n".encode()
        out += (
            b"trailer\n<< /Size " + str(max_num + 1).encode()
            + b" /Root " + str(catalog_num).encode() + b" 0 R /Info "
            + str(info_num).encode() + b" 0 R /Prev "
            + str(xref_at).encode() + b" >>\nstartxref\n"
            + str(x2).encode() + b"\n%%EOF\n"
        )
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark seam
# ---------------------------------------------------------------------------

def synthetic_pdf_media(spark, n: int = 12):
    """Deterministic PDF MEDIA_SCHEMA fixture rotating page counts /
    compression / nested page trees / incremental updates, ending with
    a dangling-xref row and a truncated row so the err channel pins."""
    from pixels_spark.functions.multimodal import MEDIA_SCHEMA

    rows = []
    for i in range(n):
        payload = encode_pdf_fixture(
            n_pages=1 + (i % 4),
            compress=(i % 3 != 1),
            title=f"Doc {i}",
            incremental_update=(i % 4 == 2),
            nested_pages=(i % 5 == 3),
            seed=i,
        )
        if i == n - 1:
            payload = payload[: len(payload) - 40]  # truncated xref
        elif i == n - 2:
            b = bytearray(payload)
            at = payload.rfind(b"startxref")
            m2 = re.search(rb"startxref\s+(\d+)", payload[at:])
            digits = m2.span(1)
            b[at + digits[0] : at + digits[1]] = b"9" * (
                digits[1] - digits[0]
            )  # xref offset way beyond payload
            payload = bytes(b)
        rows.append((i, "document", payload, "{}"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def pdf_meta(media) -> "object":
    """Arrow-batched classic-PDF walk + text extraction over a
    MEDIA_SCHEMA DataFrame; malformed payloads become err rows."""
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
            StructField("version", StringType()),
            StructField("n_objects", LongType()),
            StructField("n_pages", LongType()),
            StructField("encrypted", BooleanType()),
            StructField("title", StringType()),
            StructField("author", StringType()),
            StructField("producer", StringType()),
            StructField("text_chars", LongType()),
            StructField("text_checksum", LongType()),
            StructField("err", StringType()),
        ]
    )
    cols = [f.name for f in schema.fields]

    def run(batches):
        import pandas as pd

        for pdf_batch in batches:
            rows = []
            for mid, payload in zip(
                pdf_batch["media_id"], pdf_batch["payload"]
            ):
                row = dict.fromkeys(cols)
                row["media_id"] = mid
                try:
                    m = parse_pdf(bytes(payload))
                    for k in cols:
                        if k in ("media_id", "err"):
                            continue
                        row[k] = m.get(k)
                except DECODE_ERRORS as e:
                    row["err"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, schema=schema)
