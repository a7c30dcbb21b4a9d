"""WEBP metadata demux tests (r12): the RIFF walk must recover dims
and feature flags from all three container variants (VP8 lossy, VP8L
lossless, VP8X extended incl. animation), count frames correctly for
both animated and still extended files, and contain every malformed
shape as an err row."""

from __future__ import annotations

import hashlib

import pytest

from pixels_spark.functions import webp as WP


@pytest.mark.parametrize(
    "variant,kw",
    [
        ("lossy", {}),
        ("lossless", {}),
        ("lossless", {"with_alpha": True}),
        ("extended", {}),
        ("extended", {"with_alpha": True, "with_exif": True}),
    ],
)
def test_variants_recover_dims(variant, kw):
    p = WP.encode_webp_fixture(width=33, height=21, variant=variant, **kw)
    m = WP.parse_webp_meta(p)
    assert (m["width"], m["height"]) == (33, 21)
    assert m["variant"] == variant
    assert m["n_frames"] == 1 and not m["has_animation"]
    if kw.get("with_alpha"):
        assert m["has_alpha"]
    if kw.get("with_exif"):
        assert m["has_exif"]


def test_animation_frames_and_duration():
    p = WP.encode_webp_fixture(
        variant="extended", n_frames=4, frame_ms=25, width=10, height=8)
    m = WP.parse_webp_meta(p)
    assert m["has_animation"] and m["n_frames"] == 4
    assert m["duration_s"] == pytest.approx(0.1)
    assert (m["width"], m["height"]) == (10, 8)


def test_golden_payload_pins():
    p = WP.encode_webp_fixture(
        width=24, height=18, variant="extended", n_frames=3, frame_ms=33,
        with_alpha=True, with_exif=True, seed=6,
    )
    assert (len(p), hashlib.md5(p).hexdigest()) == (
        264, "dbac3e0e9f0dff0820334927bde75d7f",
    )
    m = WP.parse_webp_meta(p)
    assert (m["n_frames"], m["n_chunks"]) == (3, 6)


def test_malformed_payloads_fail_loudly():
    good = WP.encode_webp_fixture()
    with pytest.raises(ValueError, match="magic"):
        WP.parse_webp_meta(b"RIFX" + good[4:])
    with pytest.raises(ValueError, match="overruns"):
        WP.parse_webp_meta(good[:-9])
    bad = bytearray(good)
    at = good.index(b"\x9d\x01\x2a")
    bad[at] ^= 0xFF
    with pytest.raises(ValueError, match="start code"):
        WP.parse_webp_meta(bytes(bad))
    # RIFF/WEBP wrapper with no image chunk at all
    import struct

    empty = b"RIFF" + struct.pack("<I", 4) + b"WEBP"
    with pytest.raises(ValueError, match="no VP8"):
        WP.parse_webp_meta(empty)


def test_decode_image_routes_webp():
    from pixels_spark.functions import multimodal as M

    p = WP.encode_webp_fixture(width=9, height=7, variant="lossless")
    d = M.decode_image(p)
    assert (d["width"], d["height"], d["variant"]) == (9, 7, "lossless")


def test_webp_meta_seam_mixed_with_err_rows(spark):
    media = WP.synthetic_webp_media(spark, n=12)
    rows = {r.media_id: r for r in WP.webp_meta(media).collect()}
    assert len(rows) == 12
    for i in range(10):
        r = rows[i]
        assert r.err is None, (i, r.err)
        assert r.width == 16 + 8 * (i % 4)
        assert r.variant == ("lossy", "lossless", "extended")[i % 3]
    assert rows[10].err is not None
    assert rows[11].err is not None
