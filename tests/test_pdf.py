"""PDF demux + text-extraction tests (r12): classic xref chains (incl.
/Prev incremental updates where the NEWEST trailer must win), nested
/Pages trees, FlateDecode content streams, Tj/'/TJ tokenizing with
escape/octal unescaping, and containment of every malformed shape."""

from __future__ import annotations

import hashlib
import re

import pytest

from pixels_spark.functions import pdf as PD


def test_basic_parse_and_text():
    p = PD.encode_pdf_fixture(n_pages=2, title="Hello")
    m = PD.parse_pdf(p)
    assert m["version"] == "1.4" and m["n_pages"] == 2
    assert m["title"] == "Hello" and m["author"] == "pixels-spark"
    assert m["producer"] == "fixture (v1)"  # octal \050 \051 unescaped
    assert "Page 1 of fixture 0 (escaped)" in m["text"]  # \( \) unescaped
    assert "arrayform p1" in m["text"].replace("\n", "")  # TJ array form
    assert m["text_chars"] == len(m["text"])


def test_uncompressed_and_compressed_text_identical():
    a = PD.parse_pdf(PD.encode_pdf_fixture(n_pages=3, compress=True, seed=4))
    b = PD.parse_pdf(PD.encode_pdf_fixture(n_pages=3, compress=False, seed=4))
    assert a["text"] == b["text"]
    assert a["text_checksum"] == b["text_checksum"]


def test_nested_pages_tree():
    p = PD.encode_pdf_fixture(n_pages=4, nested_pages=True)
    m = PD.parse_pdf(p)
    assert m["n_pages"] == 4  # 1 direct leaf + 3 under the inner node


def test_incremental_update_newest_trailer_wins():
    p = PD.encode_pdf_fixture(n_pages=1, incremental_update=True, title="T")
    m = PD.parse_pdf(p)
    assert m["title"] == "T v2"  # the appended Info replaces the original
    assert m["n_pages"] == 1


def test_golden_payload_pins():
    p = PD.encode_pdf_fixture(
        n_pages=3, compress=True, title="Golden", nested_pages=True,
        incremental_update=True, seed=11,
    )
    assert (len(p), hashlib.md5(p).hexdigest()) == (
        1557, "006cc212b88145a4cd1b50bb8ac6727c",
    )
    m = PD.parse_pdf(p)
    assert (m["n_pages"], m["text_checksum"]) == (3, 10985)


def test_malformed_payloads_fail_loudly():
    good = PD.encode_pdf_fixture(seed=3)
    with pytest.raises(ValueError, match="PDF"):
        PD.parse_pdf(b"XPDF" + good[4:])
    with pytest.raises(ValueError, match="startxref|truncated"):
        PD.parse_pdf(good[:-40])
    bad = bytearray(good)
    at = good.rfind(b"startxref")
    m2 = re.search(rb"startxref\s+(\d+)", good[at:])
    s, e = m2.span(1)
    bad[at + s : at + e] = b"9" * (e - s)
    with pytest.raises(ValueError, match="beyond payload"):
        PD.parse_pdf(bytes(bad))
    # xref stream (PDF 1.5) is a documented NotImplementedError: point
    # startxref at an object instead of an 'xref' keyword
    xs = bytearray(good)
    obj_at = good.index(b"1 0 obj")
    digits = f"{obj_at}".encode()
    m3 = re.search(rb"startxref\s+(\d+)", good[at:])
    s3, e3 = m3.span(1)
    xs[at + s3 : at + e3] = digits.rjust(e3 - s3, b"0")
    with pytest.raises(NotImplementedError, match="xref streams"):
        PD.parse_pdf(bytes(xs))


def test_pdf_meta_seam_mixed_with_err_rows(spark):
    media = PD.synthetic_pdf_media(spark, n=12)
    rows = {r.media_id: r for r in PD.pdf_meta(media).collect()}
    assert len(rows) == 12
    for i in range(10):
        r = rows[i]
        assert r.err is None, (i, r.err)
        assert r.n_pages == 1 + (i % 4)
        assert r.text_chars and r.text_checksum is not None
        want_title = f"Doc {i} v2" if i % 4 == 2 else f"Doc {i}"
        assert r.title == want_title
    assert rows[10].err is not None and "beyond payload" in rows[10].err
    assert rows[11].err is not None
