"""Baseline JPEG codec tests (VERDICT r8 task #3): the decoder is
exercised without PIL by round-tripping through the fixture encoder —
the encode_png/decode_png precedent — plus spec-boundary and PIL-parity
(gated) checks."""

from __future__ import annotations

import numpy as np
import pytest

from pixels_spark.functions import jpeg as J
from pixels_spark.functions import multimodal as M


def _maxdiff(a: bytes, b: bytes) -> int:
    return int(
        np.abs(
            np.frombuffer(a, np.uint8).astype(int)
            - np.frombuffer(b, np.uint8).astype(int)
        ).max()
    )


def test_solid_color_roundtrip_exact():
    """Flat blocks are DC-only; with flat quant the round trip is exact
    across 4:4:4, 4:2:0 and restart-interval encodings."""
    rgb = bytes([120, 60, 200] * (16 * 16))
    for kw in [{}, {"subsample": True}, {"restart_interval": 1}]:
        w, h, out = J._jpeg_to_rgb(J.encode_jpeg(16, 16, rgb, **kw))
        assert (w, h) == (16, 16)
        assert _maxdiff(rgb, out) == 0, kw


def test_gradient_roundtrip_within_quant_error():
    pat = J.synthesize_jpeg(37, 23, seed=5)
    w, h, out = J._jpeg_to_rgb(pat)
    assert (w, h) == (37, 23)
    ref = bytes((x * 3 + c + 5) % 256 for x in range(37 * 23) for c in range(3))
    diff = np.abs(
        np.frombuffer(ref, np.uint8).astype(int)
        - np.frombuffer(out, np.uint8).astype(int)
    )
    assert diff.max() <= 16 and diff.mean() <= 2.0


def test_grayscale_single_component_scan():
    gray = bytes((x * 5) % 256 for x in range(24 * 16) for _ in range(3))
    enc = J.encode_jpeg(24, 16, gray, grayscale=True)
    w, h, out = J._jpeg_to_rgb(enc)
    assert (w, h) == (24, 16)
    assert _maxdiff(gray, out) <= 4
    # gray replicates to identical RGB channels
    a = np.frombuffer(out, np.uint8).reshape(-1, 3)
    assert (a[:, 0] == a[:, 1]).all() and (a[:, 1] == a[:, 2]).all()


def test_chroma_subsample_and_restarts_on_smooth_image():
    rgb = bytes(
        min(255, (x // 4 + y // 4 * 4 + c * 10))
        for y in range(40)
        for x in range(33)
        for c in range(3)
    )
    enc = J.encode_jpeg(33, 40, rgb, subsample=True, restart_interval=2)
    w, h, out = J._jpeg_to_rgb(enc)
    assert (w, h) == (33, 40)
    assert _maxdiff(rgb, out) <= 8  # 2x2 chroma mean + quant


def test_restart_interval_matches_no_restart():
    rgb = bytes((x * 7 + c) % 256 for x in range(32 * 16) for c in range(3))
    plain = J._jpeg_to_rgb(J.encode_jpeg(32, 16, rgb))
    rst = J._jpeg_to_rgb(J.encode_jpeg(32, 16, rgb, restart_interval=1))
    assert plain == rst


def test_unsupported_shapes_raise_not_implemented():
    enc = J.synthesize_jpeg(8, 8)
    sof_at = enc.find(b"\xff\xc0")
    assert sof_at > 0
    # lossless (SOF3) — still unsupported
    lossless = enc[:sof_at] + b"\xff\xc3" + enc[sof_at + 2 :]
    with pytest.raises(NotImplementedError):
        J._jpeg_to_rgb(lossless)
    # 16-bit precision is not a JPEG thing at all
    deep = bytearray(enc)
    deep[sof_at + 4] = 16
    with pytest.raises(NotImplementedError):
        J._jpeg_to_rgb(bytes(deep))
    # corrupt marker stream fails loudly
    with pytest.raises(ValueError):
        J._jpeg_to_rgb(b"\xff\xd8\x00\x00")


def test_12bit_precision_decodes():
    """12-bit sample precision (the medical/scientific JPEG variant):
    the fixture encoder scales the source to 0..4095 (×16, level shift
    2048, wider Huffman alphabets); the decoder runs the same coefficient
    path at the 12-bit range and reduces to 8-bit RGB by dropping the
    extra bits — round trip lands within ±1 of the source (tighter than
    8-bit: coefficients are 16× larger against the same flat quant).
    Covers baseline, grayscale, 4:2:0 and progressive 12-bit."""
    cases = [
        (16, 16, bytes([120, 60, 200] * 256), {}, 0),
        (37, 23, bytes((x * 3 + c + 5) % 256
                       for x in range(37 * 23) for c in range(3)), {}, 1),
        (24, 16, bytes((x * 5) % 256 for x in range(24 * 16)
                       for _ in range(3)), {"grayscale": True}, 1),
        (33, 40, bytes(min(255, (x // 4 + y // 4 * 4 + c * 10))
                       for y in range(40) for x in range(33)
                       for c in range(3)), {"subsample": True}, 1),
        (37, 23, bytes((x * 3 + c + 5) % 256
                       for x in range(37 * 23) for c in range(3)),
         {"progressive": True}, 1),
    ]
    for w, h, rgb, kw, tol in cases:
        enc = J.encode_jpeg(w, h, rgb, precision=12, **kw)
        dw, dh, out = J._jpeg_to_rgb(enc)
        assert (dw, dh) == (w, h)
        assert _maxdiff(rgb, out) <= tol, kw


def test_progressive_decode_identical_to_baseline():
    """The SOF2 scan script (spectral selection + successive
    approximation, VERDICT r9 task #2) reconstructs the EXACT same
    coefficients as the baseline single scan, so the decoded RGB must be
    byte-identical — across 4:4:4, grayscale and 4:2:0 geometries (the
    last one exercises interleaved DC + narrower-than-MCU-grid
    non-interleaved AC scans)."""
    cases = [
        (16, 16, bytes([120, 60, 200] * 256), {}),
        (37, 23, bytes((x * 3 + c + 5) % 256
                       for x in range(37 * 23) for c in range(3)), {}),
        (24, 16, bytes((x * 5) % 256 for x in range(24 * 16)
                       for _ in range(3)), {"grayscale": True}),
        (33, 40, bytes(min(255, (x // 4 + y // 4 * 4 + c * 10))
                       for y in range(40) for x in range(33)
                       for c in range(3)), {"subsample": True}),
    ]
    for w, h, rgb, kw in cases:
        enc = J.encode_jpeg(w, h, rgb, progressive=True, **kw)
        # really a progressive stream: SOF2 present, multiple SOS scans
        assert b"\xff\xc2" in enc and enc.count(b"\xff\xda") > 2, kw
        base = J._jpeg_to_rgb(J.encode_jpeg(w, h, rgb, **kw))
        assert J._jpeg_to_rgb(enc) == base, kw


def test_progressive_sparse_exercises_eobrun_and_zrl():
    """High quant → most AC coefficients are zero, forcing long EOB runs
    (EOBn symbols with extension bits) and ZRL paths in both first and
    refinement AC scans; a lone bright pixel far into the image makes
    isolated high-frequency content after long runs."""
    w, h = 64, 48
    rgb = bytearray([100] * (w * h * 3))
    for px in (5, 1000, 2345, 3000):
        rgb[px * 3 : px * 3 + 3] = b"\xff\x00\x80"
    rgb = bytes(rgb)
    for quant in (16, 64):
        enc = J.encode_jpeg(w, h, rgb, quant=quant, progressive=True)
        base = J._jpeg_to_rgb(J.encode_jpeg(w, h, rgb, quant=quant))
        assert J._jpeg_to_rgb(enc) == base, quant


def test_progressive_restart_rejected_by_fixture_encoder():
    with pytest.raises(ValueError):
        J.encode_jpeg(8, 8, bytes(192), progressive=True, restart_interval=2)


def test_cmyk_and_ycck_decode():
    """4-component Adobe JPEGs: direct CMYK (transform 0) and YCCK
    (transform 2). The fixture stores the inverted channels with K=255
    (no black ink), so the decode RGB = channel·K/255 lands back on the
    source within quant error; flat blocks are exact. A 4-component
    stream WITHOUT the Adobe APP14 marker stays NotImplementedError
    (the convention is unknowable without it)."""
    rgb = bytes((x * 3 + c + 5) % 256 for x in range(37 * 23) for c in range(3))
    flat = bytes([120, 60, 200] * 256)
    for mode in ("cmyk", "ycck"):
        enc = J.encode_jpeg(37, 23, rgb, cmyk=mode)
        w, h, out = J._jpeg_to_rgb(enc)
        assert (w, h) == (37, 23)
        assert _maxdiff(rgb, out) <= 8, mode
        assert _maxdiff(flat, J._jpeg_to_rgb(J.encode_jpeg(16, 16, flat, cmyk=mode))[2]) == 0
    enc = J.encode_jpeg(8, 8, bytes(192), cmyk="cmyk")
    at = enc.find(b"\xff\xee")
    assert at > 0
    with pytest.raises(NotImplementedError):
        J._jpeg_to_rgb(enc[:at] + enc[at + 16 :])  # APP14 stripped
    with pytest.raises(ValueError):
        J.encode_jpeg(8, 8, bytes(192), cmyk="ycck", subsample=True)


def test_decode_image_and_resize_route_jpeg():
    enc = J.synthesize_jpeg(10, 8, seed=3)
    d = M.decode_image(enc)
    assert d["width"] == 10 and d["height"] == 8 and d["n_pixels"] == 80
    small = M.resize_image(enc, 2)
    assert small[:2] == b"\xff\xd8"  # re-encoded in the source format
    ds = M.decode_image(small)
    assert (ds["width"], ds["height"]) == (5, 4)


def test_media_features_decodes_jpeg_fixture_rows(spark):
    media = M.synthetic_media(spark, n=36)
    feats = M.media_features(media).collect()
    imgs = [r for r in feats if r.kind == "image"]
    assert imgs and all(r.err is None for r in imgs)
    assert all(r.width and r.height for r in imgs)
    # the fixture rotation actually contains JPEG payloads
    payloads = {
        bytes(r.payload)[:2] for r in media.collect() if r.kind == "image"
    }
    assert b"\xff" in {p[:1] for p in payloads}


def test_pil_parity_or_golden_regression():
    """With PIL installed (a user's environment): pixel parity against
    libjpeg. Without it (this sandbox): a golden regression pin — the
    fixture stream and its decode are bit-stable, so codec regressions
    still fail loudly instead of the test skipping."""
    import hashlib

    enc = J.synthesize_jpeg(24, 18, seed=1)
    _, _, ours = J._jpeg_to_rgb(enc)
    Image = M._pil_image()
    if Image is None:
        assert hashlib.md5(enc).hexdigest() == (
            "e417afaca04942bb2d28b746557be1ac"
        ), "encoder output drifted"
        assert hashlib.md5(ours).hexdigest() == (
            "eff7e7a289d24105ff5308218b6ec388"
        ), "decoder output drifted"
        return
    import io

    with Image.open(io.BytesIO(enc)) as im:
        pil_rgb = im.convert("RGB").tobytes()
    diff = np.abs(
        np.frombuffer(pil_rgb, np.uint8).astype(int)
        - np.frombuffer(ours, np.uint8).astype(int)
    )
    # libjpeg uses an integer IDCT; small per-pixel disagreement is spec-legal
    assert diff.mean() <= 2.0 and diff.max() <= 32
