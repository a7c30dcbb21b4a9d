"""WARC crawl-source tests (r12): record framing (Content-Length +
CRLF trailer) in plain and per-record-gzip forms must agree value-for-
value, the embedded HTTP split must recover status/Content-Type/exact
body, and corrupt archives must contain as err rows."""

from __future__ import annotations

import pytest

from pixels_spark.functions import warc as WC


def _strip(rs):
    return [
        {k: v for k, v in r.items() if k not in ("gzip_member",
                                                 "block_offset")}
        for r in rs
    ]


def test_record_walk_and_http_split():
    rs = WC.parse_warc(WC.encode_warc_fixture(n_pages=3, seed=2))
    assert len(rs) == 1 + 2 * 3  # warcinfo + (request, response) per page
    assert rs[0]["type"] == "warcinfo" and rs[0]["uri"] is None
    resp = [r for r in rs if r["type"] == "response"]
    assert [r["http_status"] for r in resp] == [200, 200, 404]
    for r in resp:
        assert r["content_type"].startswith("text/html")
        assert 0 < r["body_bytes"] < r["content_length"]
        assert r["uri"].startswith("urn:fixture:page:")


def test_gzip_and_plain_forms_value_identical():
    a = _strip(WC.parse_warc(WC.encode_warc_fixture(
        n_pages=2, gzip_per_record=True, seed=5)))
    b = _strip(WC.parse_warc(WC.encode_warc_fixture(
        n_pages=2, gzip_per_record=False, seed=5)))
    assert a == b


def test_malformed_archives_fail_loudly():
    plain = WC.encode_warc_fixture(n_pages=2, gzip_per_record=False, seed=1)
    at = plain.index(b"WARC/1.0", 10)
    with pytest.raises(ValueError, match="boundary"):
        WC.parse_warc(plain[:at] + b"XXXX" + plain[at + 4 :])
    with pytest.raises(ValueError, match="Content-Length|unterminated"):
        # drop the Content-Length header of the first record
        broken = plain.replace(b"Content-Length", b"Content-Lies", 1)
        WC.parse_warc(broken)
    gz = bytearray(WC.encode_warc_fixture(n_pages=1, seed=1))
    gz[40] ^= 0xFF
    with pytest.raises(ValueError, match="deflate|CRC"):
        WC.parse_warc(bytes(gz))
    with pytest.raises(ValueError, match="trailing"):
        # truncate the plain form's final CRLFCRLF
        WC.parse_warc(plain[:-2])


def test_warc_records_seam(spark):
    media = WC.synthetic_warc_media(spark, n=12)
    rows = WC.warc_records(media).collect()
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    assert set(by_id) == set(range(12))
    for i in range(10):
        grp = by_id[i]
        assert all(r.err is None for r in grp), (i, grp)
        assert len(grp) == 1 + 2 * (1 + i % 4)
        assert all(r.gzip_member == (i % 2 == 0) for r in grp)
    for i in (10, 11):
        grp = by_id[i]
        assert len(grp) == 1 and grp[0].err is not None, (i, grp)
