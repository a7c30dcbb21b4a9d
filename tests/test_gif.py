"""GIF full-decode tests (r12): the LZW decoder must be sample-exact
(round-trip against the fixture encoder across code-width growth AND
the 4096-entry dictionary reset), interlace reordering must be
pixel-exact, GCE/NETSCAPE/comment extensions must surface, and every
malformed shape must contain as an err row — never a task failure."""

from __future__ import annotations

import hashlib
import random

import pytest

from pixels_spark.functions import gif as GF


def test_lzw_round_trip_across_width_boundaries():
    rng = random.Random(7)
    for mcs in (2, 3, 5, 8):
        for size in (1, 10, 500, 20000):
            data = bytes(rng.randrange(1 << mcs) for _ in range(size))
            assert GF.lzw_decode(GF.lzw_encode(data, mcs), mcs, size) == data


def test_lzw_round_trip_through_dictionary_reset():
    # 120k symbols at 2-bit codes forces the 4096-entry table ceiling and
    # the encoder's clear-code reset path several times over
    rng = random.Random(11)
    data = bytes(rng.randrange(4) for _ in range(120_000))
    assert GF.lzw_decode(GF.lzw_encode(data, 2), 2, len(data)) == data


def test_lzw_runs_compress_and_decode():
    # the cScSc special case (code == next table index) needs runs
    data = b"\x01" * 500 + b"\x02\x01" * 200
    enc = GF.lzw_encode(data, 2)
    assert len(enc) < len(data) // 2  # actually compresses
    assert GF.lzw_decode(enc, 2, len(data)) == data


@pytest.mark.parametrize("n_frames", [1, 2, 3])
@pytest.mark.parametrize("n_colors", [4, 16, 256])
def test_container_round_trip(n_frames, n_colors):
    p = GF.encode_gif_fixture(
        width=17, height=11, n_frames=n_frames, n_colors=n_colors,
        seed=3, delays_cs=(7, 9, 11), loop_count=5,
    )
    m = GF.decode_gif(p)
    assert (m["width"], m["height"]) == (17, 11)
    assert m["n_frames"] == n_frames
    assert m["n_colors"] == n_colors
    assert m["loop_count"] == 5
    assert m["n_pixels"] == 17 * 11 * n_frames
    assert m["duration_s"] == pytest.approx(sum((7, 9, 11)[:n_frames]) / 100)


def test_interlace_is_pixel_exact():
    # same pixels encoded interlaced and sequential must decode identically
    a = GF.decode_gif(GF.encode_gif_fixture(
        width=16, height=13, seed=3, interlace_frame=0, delays_cs=(1,)))
    b = GF.decode_gif(GF.encode_gif_fixture(
        width=16, height=13, seed=3, delays_cs=(1,)))
    assert a["n_interlaced"] == 1 and b["n_interlaced"] == 0
    assert a["pixel_checksum"] == b["pixel_checksum"]
    assert a["mean_index"] == b["mean_index"]


def test_local_palette_changes_rgb_checksum_not_indices():
    base = GF.encode_gif_fixture(width=8, height=8, n_frames=2, seed=1)
    local = GF.encode_gif_fixture(
        width=8, height=8, n_frames=2, seed=1, local_palette_frame=1)
    mb, ml = GF.decode_gif(base), GF.decode_gif(local)
    assert mb["mean_index"] == ml["mean_index"]  # same index planes
    assert mb["pixel_checksum"] != ml["pixel_checksum"]  # different palette


def test_extensions_surface():
    p = GF.encode_gif_fixture(
        transparent_index=2, comment=b"hello", loop_count=0, delays_cs=(50,))
    m = GF.decode_gif(p)
    assert m["has_transparency"] and m["has_comment"]
    assert m["loop_count"] == 0  # 0 = loop forever, still reported
    assert m["duration_s"] == pytest.approx(0.5)
    m87 = GF.decode_gif(GF.encode_gif_fixture(version=b"GIF87a"))
    assert m87["version"] == "87a"


def test_golden_payload_pins():
    # one pinned fixture payload: any encoder OR decoder drift is loud
    p = GF.encode_gif_fixture(
        width=16, height=12, n_frames=2, n_colors=16, seed=9,
        delays_cs=(4, 6), interlace_frame=1, loop_count=3,
    )
    assert (len(p), hashlib.md5(p).hexdigest()) == (
        286, "e51e7ec55fb7b09c793ba56f1c57c70d",
    )
    m = GF.decode_gif(p)
    assert (m["pixel_checksum"], m["n_pixels"]) == (141368, 384)


def test_malformed_payloads_fail_loudly():
    good = GF.encode_gif_fixture(width=16, height=12, n_colors=8)
    with pytest.raises(ValueError, match="magic"):
        GF.decode_gif(b"NOPE" + good[4:])
    with pytest.raises(ValueError, match="truncated|overruns"):
        GF.decode_gif(good[:-9])
    with pytest.raises(ValueError, match="truncated"):
        GF.decode_gif(good[:10])  # inside the logical screen descriptor
    bad = bytearray(good)
    bad[-12] ^= 0xFF  # corrupt LZW near the tail
    with pytest.raises(ValueError):
        GF.decode_gif(bytes(bad))
    # absurd declared dims must be rejected before allocation
    huge = bytearray(good)
    at = 13 + 3 * 8  # header + LSD, then the 8-color GCT -> image descriptor
    assert huge[at] == 0x2C
    huge[at + 5 : at + 9] = b"\xff\xff\xff\xff"  # fw = fh = 65535
    with pytest.raises(ValueError, match="out of bounds"):
        GF.decode_gif(bytes(huge))
    with pytest.raises(ValueError, match="no image frames"):
        # LSD with no GCT flag, straight to trailer
        GF.decode_gif(b"GIF89a" + good[6:10] + b"\x00\x00\x00\x3b")


def test_decode_image_routes_gif():
    from pixels_spark.functions import multimodal as M

    p = GF.encode_gif_fixture(width=9, height=7, n_frames=2, delays_cs=(10, 10))
    d = M.decode_image(p)
    assert (d["width"], d["height"], d["n_frames"]) == (9, 7, 2)
    assert d["duration_s"] == pytest.approx(0.2)


def test_gif_meta_seam_mixed_with_err_rows(spark):
    media = GF.synthetic_gif_media(spark, n=12)
    rows = {r.media_id: r for r in GF.gif_meta(media).collect()}
    assert len(rows) == 12
    for i in range(10):
        r = rows[i]
        assert r.err is None, (i, r.err)
        assert r.width == 8 + 4 * (i % 4) and r.n_frames == 1 + (i % 3)
        assert r.pixel_checksum is not None and r.n_pixels > 0
    # the two malformed tail rows contain as err rows, not task failures
    assert rows[10].err is not None and "ValueError" in rows[10].err
    assert rows[11].err is not None


def test_edge_dims_and_max_palette():
    assert GF.decode_gif(GF.encode_gif_fixture(width=1, height=1,
                                               n_colors=4))["n_pixels"] == 1
    m = GF.decode_gif(GF.encode_gif_fixture(width=5, height=3, n_colors=256,
                                            interlace_frame=0))
    assert m["n_pixels"] == 15 and m["n_interlaced"] == 1
    assert GF.decode_gif(GF.encode_gif_fixture(width=64, height=64,
                                               n_colors=256,
                                               n_frames=2))["n_pixels"] == 8192
