"""BMP full-decode tests (r12): the RLE8 decompressor must be
pixel-exact (round-trip vs the fixture encoder; RLE-vs-flat encodes of
the same pixels decode identically), row orders normalize, and every
malformed shape contains as an err row — never a task failure."""

from __future__ import annotations

import hashlib
import struct

import pytest

from pixels_spark.functions import bmp as BM


def test_rle8_round_trip():
    rows = [
        bytes((x // 4 + y * 3) % 64 for x in range(23)) for y in range(9)
    ]
    assert BM.rle8_decode(BM.rle8_encode(rows), 23, 9) == rows
    assert BM.rle8_decode(BM.rle8_encode(rows, absolute_every=2), 23, 9) == rows


def test_rle8_delta_skips_default_to_zero():
    # handcrafted stream: run of 3 (v=7), delta +2/+1, run of 2 (v=9), EOL, EOB
    data = bytes([3, 7, 0, 2, 2, 1, 2, 9, 0, 0, 0, 1])
    rows = BM.rle8_decode(data, 8, 2)
    assert rows[0] == bytes([7, 7, 7, 0, 0, 0, 0, 0])
    assert rows[1] == bytes([0, 0, 0, 0, 0, 9, 9, 0])


@pytest.mark.parametrize("bpp,rle", [(24, False), (8, False), (8, True)])
@pytest.mark.parametrize("top_down", [False, True])
def test_decode_forms(bpp, rle, top_down):
    p = BM.encode_bmp_fixture(
        width=17, height=11, bpp=bpp, rle=rle, top_down=top_down,
        n_colors=32, seed=5,
    )
    m = BM.decode_bmp(p)
    assert (m["width"], m["height"], m["bpp"]) == (17, 11, bpp)
    assert m["compression"] == (1 if rle else 0)
    assert m["top_down"] == top_down
    assert m["n_pixels"] == 17 * 11


def test_rle_vs_flat_pixel_exact():
    a = BM.decode_bmp(BM.encode_bmp_fixture(
        width=20, height=9, bpp=8, rle=True, n_colors=32, seed=4))
    b = BM.decode_bmp(BM.encode_bmp_fixture(
        width=20, height=9, bpp=8, rle=False, n_colors=32, seed=4))
    assert a["pixel_checksum"] == b["pixel_checksum"]
    assert a["mean_byte"] == b["mean_byte"]


def test_golden_payload_pins():
    p = BM.encode_bmp_fixture(
        width=16, height=12, bpp=8, rle=True, n_colors=64, seed=9)
    assert (len(p), hashlib.md5(p).hexdigest()) == (
        468, "cd5071c62fefee5b8408cc3adac18e72",
    )
    m = BM.decode_bmp(p)
    assert (m["pixel_checksum"], m["n_pixels"]) == (74752, 192)


def test_malformed_payloads_fail_loudly():
    good = BM.encode_bmp_fixture()
    with pytest.raises(ValueError, match="magic"):
        BM.decode_bmp(b"XX" + good[2:])
    with pytest.raises(ValueError, match="truncated"):
        BM.decode_bmp(good[:-9])
    with pytest.raises(ValueError, match="headers"):
        BM.decode_bmp(good[:20])
    huge = bytearray(good)
    struct.pack_into("<i", huge, 18, 1 << 24)
    with pytest.raises(ValueError, match="out of bounds"):
        BM.decode_bmp(bytes(huge))
    over = bytearray(BM.encode_bmp_fixture(bpp=8, rle=True))
    over[-6] = 0xFF  # run past the row edge
    with pytest.raises(ValueError, match="overruns|truncated"):
        BM.decode_bmp(bytes(over))
    with pytest.raises(NotImplementedError):  # 4-bit stays documented-out
        hdr = bytearray(good[:54])
        struct.pack_into("<H", hdr, 28, 4)
        BM.decode_bmp(bytes(hdr) + good[54:])


def test_decode_image_routes_bmp():
    from pixels_spark.functions import multimodal as M

    p = BM.encode_bmp_fixture(width=9, height=7)
    d = M.decode_image(p)
    assert (d["width"], d["height"], d["maxval"]) == (9, 7, 255)
    assert d["mean_byte"] > 0


def test_bmp_meta_seam_mixed_with_err_rows(spark):
    media = BM.synthetic_bmp_media(spark, n=12)
    rows = {r.media_id: r for r in BM.bmp_meta(media).collect()}
    assert len(rows) == 12
    for i in range(10):
        r = rows[i]
        assert r.err is None, (i, r.err)
        assert r.width == 8 + 4 * (i % 4)
        assert r.pixel_checksum is not None
    assert rows[10].err is not None
    assert rows[11].err is not None


def test_edge_widths_exercise_stride_padding():
    for w in (1, 2, 3, 4, 5):
        assert BM.decode_bmp(BM.encode_bmp_fixture(
            width=w, height=1, bpp=24))["n_pixels"] == w
        assert BM.decode_bmp(BM.encode_bmp_fixture(
            width=w, height=2, bpp=8, rle=True, n_colors=16))["n_pixels"] == 2 * w
