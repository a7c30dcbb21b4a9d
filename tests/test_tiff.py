"""TIFF tests (r12): the IFD walk must handle both byte orders,
multi-page chains and exact strip ranges; the TIFF-variant LZW (MSB-
first, EARLY width change — one code sooner than GIF's) must be
sample-exact; Predictor=2 must undo; and every malformed shape must
contain as an err row."""

from __future__ import annotations

import hashlib
import random
import struct

import pytest

from pixels_spark.functions import tiff as TF


def test_lzw_round_trip_with_early_change_and_reset():
    rng = random.Random(3)
    for size in (1, 10, 1000, 30000, 60000):  # 60k forces dict resets
        data = bytes(rng.randrange(256) for _ in range(size))
        assert TF.tiff_lzw_decode(TF.tiff_lzw_encode(data), size) == data
    runs = b"\x05" * 4000 + bytes(rng.randrange(8) for _ in range(4000))
    assert TF.tiff_lzw_decode(TF.tiff_lzw_encode(runs), len(runs)) == runs


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("compression,predictor", [(1, 1), (5, 1), (5, 2)])
def test_decode_forms(big_endian, compression, predictor):
    p = TF.encode_tiff_fixture(
        width=17, height=11, spp=3, compression=compression,
        predictor=predictor, big_endian=big_endian, rows_per_strip=4,
        seed=5,
    )
    m = TF.decode_tiff(p)
    assert (m["width"], m["height"], m["samples_per_pixel"]) == (17, 11, 3)
    assert m["byte_order"] == ("MM" if big_endian else "II")
    assert m["compression"] == compression
    assert m["decoded_pages"] == 1 and m["n_pixels"] == 17 * 11
    assert m["n_strips"] == 3  # ceil(11/4)


def test_compression_and_predictor_are_pixel_exact():
    a = TF.decode_tiff(TF.encode_tiff_fixture(
        width=20, height=10, spp=3, compression=5, predictor=2, seed=4))
    b = TF.decode_tiff(TF.encode_tiff_fixture(
        width=20, height=10, spp=3, compression=1, seed=4))
    assert a["pixel_checksum"] == b["pixel_checksum"]
    assert a["mean_byte"] == b["mean_byte"]


def test_multi_page_chain():
    p = TF.encode_tiff_fixture(width=8, height=6, n_pages=3, seed=2)
    m = TF.decode_tiff(p)
    assert m["n_pages"] == 3 and m["decoded_pages"] == 3
    assert m["n_pixels"] == 3 * 8 * 6
    assert len(m["pages"]) == 3


def test_strip_ranges_are_byte_exact():
    p = TF.encode_tiff_fixture(width=16, height=12, rows_per_strip=5, seed=7)
    m = TF.decode_tiff(p)
    total = 0
    for off, cnt in m["pages"][0]["strip_ranges"]:
        assert len(p[off : off + cnt]) == cnt
        total += cnt
    assert total == m["strip_bytes"]
    assert m["n_strips"] == 3  # ceil(12/5)


def test_jpeg_in_tiff_is_metadata_only():
    p = TF.encode_tiff_fixture(width=8, height=6, seed=9)
    b = bytearray(p)
    at = p.index(struct.pack("<HH", 259, 3))
    struct.pack_into("<I", b, at + 8, 7)  # compression = JPEG
    m = TF.decode_tiff(bytes(b))
    assert m["compression"] == 7 and m["decoded_pages"] == 0
    assert m["pixel_checksum"] is None and m["n_strips"] == 1


def test_golden_payload_pins():
    p = TF.encode_tiff_fixture(
        width=16, height=12, spp=3, compression=5, predictor=2,
        big_endian=True, n_pages=2, rows_per_strip=4, seed=9,
    )
    assert (len(p), hashlib.md5(p).hexdigest()) == (
        560, "bf37d24c7a98081ee69c03b862391dee",
    )
    m = TF.decode_tiff(p)
    assert (m["pixel_checksum"], m["n_pixels"]) == (166336, 384)


def test_malformed_payloads_fail_loudly():
    good = TF.encode_tiff_fixture(seed=1)
    with pytest.raises(ValueError, match="magic"):
        TF.decode_tiff(b"XX*\x00" + good[4:])
    with pytest.raises(ValueError, match="overrun|beyond"):
        TF.decode_tiff(good[:-13])
    bad = bytearray(good)
    at = good.index(struct.pack("<HH", 273, 4))
    struct.pack_into("<I", bad, at + 8, len(good) + 1000)
    with pytest.raises(ValueError, match="strip overruns"):
        TF.decode_tiff(bytes(bad))
    huge = bytearray(good)
    at2 = good.index(struct.pack("<HH", 256, 4))
    struct.pack_into("<I", huge, at2 + 8, 1 << 24)
    with pytest.raises(ValueError, match="out of bounds"):
        TF.decode_tiff(bytes(huge))
    # IFD loop must not hang
    loop = bytearray(TF.encode_tiff_fixture(seed=1))
    first = struct.unpack_from("<I", loop, 4)[0]
    n = struct.unpack_from("<H", loop, first)[0]
    struct.pack_into("<I", loop, first + 2 + 12 * n, first)  # next -> self
    with pytest.raises(ValueError, match="loops"):
        TF.decode_tiff(bytes(loop))


def test_decode_image_routes_tiff():
    from pixels_spark.functions import multimodal as M

    p = TF.encode_tiff_fixture(width=9, height=7, spp=3, compression=5)
    d = M.decode_image(p)
    assert (d["width"], d["height"], d["n_pixels"]) == (9, 7, 63)
    assert d["pixel_checksum"] is not None


def test_tiff_meta_seam_mixed_with_err_rows(spark):
    media = TF.synthetic_tiff_media(spark, n=12)
    rows = {r.media_id: r for r in TF.tiff_meta(media).collect()}
    assert len(rows) == 12
    for i in range(10):
        r = rows[i]
        assert r.err is None, (i, r.err)
        if i == 9:
            assert r.compression == 7 and r.pixel_checksum is None
        else:
            assert r.decoded_pages == r.n_pages and r.pixel_checksum is not None
    assert rows[10].err is not None and "overruns" in rows[10].err
    assert rows[11].err is not None


def test_edge_strip_shapes():
    m = TF.decode_tiff(TF.encode_tiff_fixture(
        width=7, height=5, rows_per_strip=1, compression=5, predictor=2,
        spp=3))
    assert m["n_strips"] == 5 and m["decoded_pages"] == 1
    assert TF.decode_tiff(TF.encode_tiff_fixture(
        width=7, height=5, rows_per_strip=100))["n_strips"] == 1
