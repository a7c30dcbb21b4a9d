"""Archive demux tests (r12): TAR/ZIP/GZIP walks must recover exact
member byte ranges and decompressed content, CROSS-VALIDATED against
the stdlib tarfile/zipfile/gzip implementations in BOTH directions
(our encoder -> stdlib reader, stdlib writer -> our parser); corrupt
archives must contain as err rows."""

from __future__ import annotations

import gzip as gz
import io
import tarfile
import zipfile

import pytest

from pixels_spark.functions import archive as AR

FILES = [
    ("docs/a.txt", b"hello world " * 40),
    ("docs/b.bin", bytes(range(256)) * 7),
    ("c.txt", b"x"),
]


def _cks(d: bytes) -> int:
    return sum(d) % 2147483648


def test_tar_cross_validated_both_directions():
    t = AR.encode_tar_fixture(FILES)
    ms = AR.parse_tar(t)
    assert [(m["name"], m["uncomp_size"]) for m in ms] == [
        (n, len(d)) for n, d in FILES
    ]
    # ours -> stdlib
    tf = tarfile.open(fileobj=io.BytesIO(t))
    for n, d in FILES:
        assert tf.extractfile(n).read() == d
    # exact ranges: slicing the payload reproduces each member
    for (n, d), m in zip(FILES, ms):
        assert t[m["offset"] : m["offset"] + m["uncomp_size"]] == d
        assert m["content_checksum"] == _cks(d)
    # stdlib -> ours
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as w:
        for n, d in FILES:
            info = tarfile.TarInfo(n)
            info.size = len(d)
            w.addfile(info, io.BytesIO(d))
    ms2 = AR.parse_tar(buf.getvalue())
    assert [(m["name"], m["content_checksum"]) for m in ms2] == [
        (n, _cks(d)) for n, d in FILES
    ]


def test_zip_cross_validated_both_directions():
    z = AR.encode_zip_fixture(FILES, stored_every=2)
    ms = AR.parse_zip(z)
    assert [m["name"] for m in ms] == [n for n, _ in FILES]
    assert ms[0]["method"] == "store" and ms[1]["method"] == "deflate"
    zf = zipfile.ZipFile(io.BytesIO(z))
    for n, d in FILES:
        assert zf.read(n) == d
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as w:
        for n, d in FILES:
            w.writestr(n, d)
    ms2 = AR.parse_zip(buf.getvalue())
    assert [(m["name"], m["content_checksum"]) for m in ms2] == [
        (n, _cks(d)) for n, d in FILES
    ]


def test_gzip_multi_member_cross_validated():
    g = AR.encode_gzip_fixture(FILES)
    ms = AR.parse_gzip(g)
    assert [m["name"] for m in ms] == [n for n, _ in FILES]
    # stdlib reads concatenated members as one stream
    assert gz.decompress(g) == b"".join(d for _, d in FILES)
    buf = io.BytesIO()
    for n, d in FILES:
        buf.write(gz.compress(d, mtime=0))
    ms2 = AR.parse_gzip(buf.getvalue())
    assert [m["content_checksum"] for m in ms2] == [
        _cks(d) for _, d in FILES
    ]


def test_sniffer():
    assert AR.sniff_archive(AR.encode_tar_fixture(FILES))[0] == "tar"
    assert AR.sniff_archive(AR.encode_zip_fixture(FILES))[0] == "zip"
    assert AR.sniff_archive(AR.encode_gzip_fixture(FILES))[0] == "gzip"
    with pytest.raises(ValueError, match="not a TAR"):
        AR.sniff_archive(b"nope" * 100)


def test_malformed_archives_fail_loudly():
    zp = AR.encode_zip_fixture(FILES, stored_every=2)
    m0 = AR.parse_zip(zp)[0]  # stored member: flip = clean CRC mismatch
    z = bytearray(zp)
    z[m0["offset"] + 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|deflate"):
        AR.parse_zip(bytes(z))
    t = AR.encode_tar_fixture(FILES)
    with pytest.raises(ValueError, match="marker|overruns"):
        AR.parse_tar(t[:-1200])
    tb = bytearray(t)
    tb[20] ^= 0xFF  # corrupt a header byte -> checksum mismatch
    with pytest.raises(ValueError, match="checksum"):
        AR.parse_tar(bytes(tb))
    g = bytearray(AR.encode_gzip_fixture(FILES))
    g[-5] ^= 0xFF  # flip ISIZE
    with pytest.raises(ValueError, match="ISIZE|CRC"):
        AR.parse_gzip(bytes(g))
    with pytest.raises(NotImplementedError, match="method"):
        # forge a bzip2-method zip entry
        zz = bytearray(AR.encode_zip_fixture(FILES[:1]))
        at = bytes(zz).index(b"PK\x01\x02")
        zz[at + 10] = 12
        import struct as _s

        lat = bytes(zz).index(b"PK\x03\x04")
        zz[lat + 8] = 12
        AR.parse_zip(bytes(zz))


def test_archive_manifest_seam(spark):
    media = AR.synthetic_archive_media(spark, n=12)
    rows = AR.archive_manifest(media).collect()
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    assert set(by_id) == set(range(12))
    for i in range(10):
        grp = by_id[i]
        assert all(r.err is None for r in grp), (i, grp)
        assert len(grp) == 2 + i % 3  # member count matches the fixture
        fmt = ("tar", "zip", "gzip")[i % 3]
        assert all(r.fmt == fmt for r in grp)
        assert all(r.content_checksum is not None for r in grp)
    # corrupt + truncated tails are single err rows
    for i in (10, 11):
        grp = by_id[i]
        assert len(grp) == 1 and grp[0].err is not None, (i, grp)


def test_edge_members_empty_unicode_large():
    fs = [("empty.txt", b""), ("uni/éè.txt", b"data"), ("big.bin", bytes(50000))]
    for enc, dec in (
        (AR.encode_tar_fixture, AR.parse_tar),
        (AR.encode_zip_fixture, AR.parse_zip),
        (AR.encode_gzip_fixture, AR.parse_gzip),
    ):
        ms = dec(enc(fs))
        assert [m["uncomp_size"] for m in ms] == [0, 4, 50000], enc.__name__
        assert ms[1]["name"] == "uni/éè.txt"
