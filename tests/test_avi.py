"""AVI RIFF metadata demux tests (r12): the chunk walk must recover
main-header + per-stream metadata, plan exact per-frame byte ranges
(every frame body reconstructible from offsets+sizes), cross-check the
idx1 index against the movi walk, and contain every malformed shape as
a ValueError — never a task failure."""

from __future__ import annotations

import hashlib

import pytest

from pixels_spark.functions import avi as AV


@pytest.mark.parametrize(
    "kw, want",
    [
        ({}, (32, 24, 5, 25.0, "MJPG")),
        ({"codec": b"I420", "fps": 30}, (32, 24, 5, 30.0, "I420")),
        ({"width": 64, "height": 48, "n_frames": 9}, (64, 48, 9, 25.0, "MJPG")),
        ({"with_audio": True, "audio_rate": 16000}, (32, 24, 5, 25.0, "MJPG")),
        ({"with_idx1": False}, (32, 24, 5, 25.0, "MJPG")),
    ],
)
def test_walk_recovers_header_params(kw, want):
    p = AV.encode_avi_fixture(seed=4, **kw)
    m = AV.parse_avi_meta(p)
    assert (m["width"], m["height"], m["n_frames"], m["fps"],
            m["video_codec"]) == want
    assert m["duration_s"] == pytest.approx(want[2] / want[3])
    if kw.get("with_audio"):
        assert m["audio_rate"] == kw["audio_rate"]
        assert m["audio_tag"] == 1 and m["audio_channels"] == 1
        assert m["n_streams"] == 2
    if kw.get("with_idx1") is False:
        assert m["idx1_entries"] is None


def test_frame_ranges_are_byte_exact():
    p = AV.encode_avi_fixture(n_frames=7, seed=2, with_audio=True)
    m = AV.parse_avi_meta(p)
    assert len(m["frame_ranges"]) == 7
    # every planned range lands inside the payload and re-sums exactly
    total = 0
    for off, size in m["frame_ranges"]:
        body = p[off : off + size]
        assert len(body) == size
        total += size
    assert total == m["frame_bytes"]
    assert m["first_frame_off"] == m["frame_ranges"][0][0]
    assert m["last_frame_end"] == sum(m["frame_ranges"][-1])
    # frames interleave with audio chunks: 7 video + 7 audio
    assert m["n_chunks"] == 14 and m["idx1_entries"] == 14


def test_golden_payload_pins():
    p = AV.encode_avi_fixture(
        width=40, height=30, n_frames=4, fps=15, codec=b"DIB ",
        with_audio=True, audio_rate=24000, seed=7,
    )
    assert (len(p), hashlib.md5(p).hexdigest()) == (
        1052, "60886dbadb30e4306765e70e1f3fc708",
    )
    m = AV.parse_avi_meta(p)
    assert (m["n_frames"], m["frame_bytes"], m["n_chunks"]) == (4, 400, 8)


def test_malformed_payloads_fail_loudly():
    good = AV.encode_avi_fixture(seed=1)
    with pytest.raises(ValueError, match="magic"):
        AV.parse_avi_meta(b"RIFX" + good[4:])
    with pytest.raises(ValueError, match="overruns"):
        AV.parse_avi_meta(good[:-11])
    # idx1 count vs movi walk mismatch
    bad = bytearray(AV.encode_avi_fixture(seed=1))
    at = bytes(bad).index(b"idx1") + 4
    import struct

    n = struct.unpack_from("<I", bad, at)[0]
    struct.pack_into("<I", bad, at, n - 16)
    with pytest.raises(ValueError, match="idx1|overruns"):
        AV.parse_avi_meta(bytes(bad))
    # avih frame count vs movi mismatch
    bad2 = bytearray(AV.encode_avi_fixture(seed=1))
    at2 = bytes(bad2).index(b"avih") + 8 + 16
    bad2[at2] ^= 0x01
    with pytest.raises(ValueError, match="claims"):
        AV.parse_avi_meta(bytes(bad2))
    # missing movi: header-only RIFF
    hdr_end = bytes(AV.encode_avi_fixture(seed=1)).index(b"LIST",
                                                         12 + 4)  # hdrl LIST
    with pytest.raises(ValueError):
        AV.parse_avi_meta(good[: hdr_end + 4])


def test_decode_video_routes_avi():
    from pixels_spark.functions import multimodal as M

    p = AV.encode_avi_fixture(width=20, height=10, n_frames=6, fps=30)
    d = M.decode_video(p)
    assert (d["width"], d["height"], d["n_frames"]) == (20, 10, 6)
    assert d["duration_s"] == pytest.approx(0.2)


def test_avi_meta_seam_mixed_with_err_rows(spark):
    media = AV.synthetic_avi_media(spark, n=12)
    rows = {r.media_id: r for r in AV.avi_meta(media).collect()}
    assert len(rows) == 12
    for i in range(10):
        r = rows[i]
        assert r.err is None, (i, r.err)
        assert r.width == 16 + 8 * (i % 4) and r.n_frames == 3 + (i % 5)
        assert r.frame_bytes > 0 and r.first_frame_off > 0
    assert rows[10].err is not None and "claims" in rows[10].err
    assert rows[11].err is not None
