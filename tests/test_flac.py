"""FLAC codec tests (VERDICT r9 task #3): sample-exact round trips
through the fixture encoder across subframe types, stereo decorrelation
modes, Rice partitioning and escape partitions — plus integrity-check
and seam-routing coverage. The decoder verifies CRC-8/CRC-16/MD5
itself, so every green round trip is an end-to-end integrity proof."""

from __future__ import annotations

import pytest

from pixels_spark.functions import flac as FL
from pixels_spark.functions import multimodal as M


def _expected(n, channels, bps, seed):
    lim = 1 << (bps - 1)
    return [
        [
            max(-lim, min(lim - 1, ((i * (7 + 3 * c) + seed * 13) % 2048) - 1024))
            for i in range(n)
        ]
        for c in range(channels)
    ]


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"channels": 2},
        {"channels": 2, "stereo_mode": "left_side"},
        {"channels": 2, "stereo_mode": "right_side"},
        {"channels": 2, "stereo_mode": "mid_side"},
        {"n_samples": 5000, "block_size": 1024},  # multi-frame
        {"n_samples": 777, "block_size": 192},  # short last frame
        {"bps": 8, "n_samples": 500},
        {"bps": 24, "n_samples": 500},
        {"partition_order": 2},
        {"force_escape": True},
        {
            "channels": 2,
            "stereo_mode": "mid_side",
            "partition_order": 2,
            "n_samples": 4096,
            "block_size": 2048,
        },
    ],
)
def test_roundtrip_sample_exact(kw):
    payload = FL.synthesize_flac(**kw)
    d = FL.decode_flac(payload)
    n = kw.get("n_samples", 1600)
    ch = kw.get("channels", 1)
    bps = kw.get("bps", 16)
    assert d["samples"] == _expected(n, ch, bps, kw.get("seed", 0))
    assert (d["n_samples"], d["channels"], d["bits"]) == (n, ch, bps)
    assert d["duration_s"] == pytest.approx(n / 16000)


def test_constant_and_verbatim_subframes():
    # constant channel → CONSTANT subframe; the ramp channel uses FIXED
    payload = FL.encode_flac([[42] * 256, list(range(-128, 128))], bps=16)
    d = FL.decode_flac(payload)
    assert d["samples"] == [[42] * 256, list(range(-128, 128))]


def test_corruption_fails_loudly():
    payload = bytearray(FL.synthesize_flac(n_samples=256, block_size=256))
    with pytest.raises(ValueError):
        FL.decode_flac(b"RIFF" + bytes(payload[4:]))
    # flip a bit inside the frame body → CRC-16 (or MD5) must catch it
    bad = bytearray(payload)
    bad[-10] ^= 0x40
    with pytest.raises(ValueError):
        FL.decode_flac(bytes(bad))
    # corrupt the frame header → CRC-8 must catch it
    hdr_at = len(payload) - 1
    sync_at = payload.index(b"\xff\xf8")
    bad = bytearray(payload)
    bad[sync_at + 4] ^= 0x01  # inside the header, before its CRC byte
    with pytest.raises(ValueError):
        FL.decode_flac(bytes(bad))
    assert hdr_at  # silence lints


def test_decode_audio_routes_flac_and_wav():
    fl = M.decode_audio(FL.synthesize_flac(8000, n_samples=800))
    assert fl["sample_rate"] == 8000 and fl["n_samples"] == 800
    assert "samples" not in fl  # feature rows carry metadata only
    wv = M.decode_audio(M.synthesize_wav(16000, n_samples=1600))
    assert wv["sample_rate"] == 16000
    with pytest.raises(NotImplementedError):
        M.decode_audio(b"ID3\x04...mp3 frames")  # MP3 still needs ffmpeg


def test_media_features_decodes_flac_fixture_rows(spark):
    media = M.synthetic_media(spark, n=48)
    feats = {r.media_id: r for r in M.media_features(media).collect()}
    auds = [r for r in feats.values() if r.kind == "audio"]
    assert auds and all(r.err is None for r in auds)
    assert all(r.sample_rate and r.duration_s for r in auds)
    # the rotation really contains FLAC payloads
    payloads = [bytes(r.payload) for r in media.collect() if r.kind == "audio"]
    assert any(p[:4] == b"fLaC" for p in payloads)
    assert any(p[:4] == b"RIFF" for p in payloads)


def test_unknown_length_stream_decodes_to_eof():
    # RFC 9639: STREAMINFO total_samples == 0 means "unknown length";
    # the decoder must decode frames to end-of-payload, not return 0
    # samples (ADVICE r10 #1). Zero the 36-bit total field in place:
    # payload = fLaC(4) + block hdr(4) + STREAMINFO, total at si[13]
    # low nibble + si[14:18].
    payload = bytearray(FL.synthesize_flac(n_samples=1600, block_size=512))
    payload[8 + 13] &= 0xF0
    payload[8 + 14 : 8 + 18] = b"\x00\x00\x00\x00"
    d = FL.decode_flac(bytes(payload))
    assert d["n_samples"] == 1600
    assert d["samples"] == _expected(1600, 1, 16, 0)
    assert d["duration_s"] == pytest.approx(0.1)


def test_streaminfo_min_blocksize_excludes_last_block():
    # RFC 9639: min/max blocksize exclude the final partial block and
    # must be >= 16 — a fixed-blocksize stream stamps block_size for
    # both even when n % block_size != 0 (ADVICE r10 #2).
    payload = FL.synthesize_flac(n_samples=777, block_size=192)
    assert payload[8:10] == payload[10:12] == (192).to_bytes(2, "big")
    d = FL.decode_flac(payload)
    assert d["n_samples"] == 777


# ---------------------------------------------------------------------------
# LPC subframes (VERDICT r10 task #7, closed in r12): the decode branch
# at flac.py (st >= 32) must be executed by a fixture whose encoder
# performs real quantized-coefficient LPC (Levinson–Durbin, RFC 9639
# §9.2.4) — previously untested dead code.


def _sine_mix(n, seed=0, amp=8000):
    import math

    return [
        round(
            amp * math.sin(2 * math.pi * 440 * i / 16000 + seed)
            + (amp / 4) * math.sin(2 * math.pi * 97 * i / 16000)
        )
        for i in range(n)
    ]


@pytest.mark.parametrize(
    "kw",
    [
        {"lpc_order": 1},
        {"lpc_order": 2},
        {"lpc_order": 8},
        {"lpc_order": 12},
        {"lpc_order": 8, "partition_order": 2},
        {"lpc_order": 8, "force_escape": True},
        {"lpc_order": 8, "block_size": 192, "n": 700},  # multi-frame + tail
        {"lpc_order": 4, "bps": 24},
    ],
)
def test_lpc_roundtrip_sample_exact(kw):
    n = kw.pop("n", 2048)
    bps = kw.get("bps", 16)
    sig = _sine_mix(n, amp=(1 << (bps - 2)) - 1)
    payload = FL.encode_flac([sig], **kw)
    d = FL.decode_flac(payload)
    assert d["samples"] == [sig]
    # the LPC branch demonstrably ran: subframe type st>=32 decoded
    assert any(t.startswith("LPC") for t in d["subframe_types"]), d[
        "subframe_types"
    ]
    assert f"LPC{kw['lpc_order']}" in d["subframe_types"]


def test_lpc_stereo_decorrelation_modes():
    import math

    l = _sine_mix(1500, seed=0.0)
    r = [round(0.9 * v + 30 * math.sin(i / 7)) for i, v in enumerate(l)]
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        payload = FL.encode_flac([l, r], stereo_mode=mode, lpc_order=6)
        d = FL.decode_flac(payload)
        assert d["samples"] == [l, r], mode
        assert any(t.startswith("LPC") for t in d["subframe_types"]), mode


def test_lpc_degenerate_signals_fall_back_to_fixed():
    # all-zero energy → _lpc_analyze returns None → FIXED/CONSTANT path
    payload = FL.encode_flac([[0] * 256], lpc_order=8)
    d = FL.decode_flac(payload)
    assert d["samples"] == [[0] * 256]
    assert d["subframe_types"] == ["CONSTANT"]
    # a ramp is perfectly predicted by FIXED anyway; LPC must still be
    # sample-exact when requested on it
    ramp = list(range(-500, 524))
    d = FL.decode_flac(FL.encode_flac([ramp], lpc_order=8))
    assert d["samples"] == [ramp]


def test_lpc_golden_payload_pinned():
    """Golden-oracle parity: the LPC fixture encoder is deterministic,
    so the exact encoded bytes AND decoded stats pin — any drift in the
    Levinson–Durbin → quantize → Rice chain breaks this on either side."""
    import hashlib

    sig = _sine_mix(1024)
    payload = FL.encode_flac([sig], lpc_order=8)
    d = FL.decode_flac(payload)
    assert d["n_samples"] == 1024 and d["subframe_types"] == ["LPC8"]
    digest = hashlib.md5(payload).hexdigest()
    # pinned from the first green run; decode MD5-verifies the samples
    assert len(payload) == _LPC_GOLDEN_LEN, (len(payload), digest)
    assert digest == _LPC_GOLDEN_MD5, digest


_LPC_GOLDEN_LEN = 1202
_LPC_GOLDEN_MD5 = "bf54050e103dd4b5a99f9e15b88e92c0"
