"""MP3 frame-header metadata demux tests (r12, closing the audio half
of VERDICT r11 missing #2): the walk must recover version / layer /
rate / channels and plan exact per-frame byte ranges (every frame body
is reconstructible from offsets+sizes), detect VBR and Xing counts, and
contain every malformed shape as ValueError/NotImplementedError."""

from __future__ import annotations

import pytest

from pixels_spark.functions import mp3 as M3


@pytest.mark.parametrize(
    "kw, want",
    [
        ({}, ("1", 3, 44100, 2)),
        ({"kbps": 320}, ("1", 3, 44100, 2)),
        ({"layer": 2, "kbps": 64, "sample_rate": 32000}, ("1", 2, 32000, 2)),
        ({"layer": 1, "kbps": 256}, ("1", 1, 44100, 2)),
        ({"version": "2", "sample_rate": 22050, "kbps": 64}, ("2", 3, 22050, 2)),
        ({"version": "2.5", "sample_rate": 8000, "kbps": 32}, ("2.5", 3, 8000, 2)),
        ({"channels": 1}, ("1", 3, 44100, 1)),
        ({"id3v2_bytes": 200}, ("1", 3, 44100, 2)),
    ],
)
def test_walk_recovers_header_params(kw, want):
    payload = M3.encode_mp3_fixture(n_frames=12, seed=5, **kw)
    m = M3.parse_mp3_meta(payload)
    assert (m["version"], m["layer"], m["sample_rate"], m["channels"]) == want
    assert m["n_frames"] == 12
    spf = 384 if want[1] == 1 else (1152 if want[0] == "1" or want[1] == 2 else 576)
    assert m["samples_per_frame"] == spf
    assert m["duration_s"] == pytest.approx(12 * spf / want[2])
    assert not m["is_vbr"]
    # frame ranges tile the stream exactly (after the ID3v2 prefix)
    assert m["frame_offsets"][0] == m["id3v2_bytes"]
    for i in range(11):
        assert (
            m["frame_offsets"][i] + m["frame_sizes"][i]
            == m["frame_offsets"][i + 1]
        )
    assert m["frame_offsets"][-1] + m["frame_sizes"][-1] == len(payload)


def test_vbr_and_xing():
    m = M3.parse_mp3_meta(
        M3.encode_mp3_fixture(n_frames=9, vbr_rotate=(4, 9, 12), seed=1)
    )
    assert m["is_vbr"] and m["xing_frames"] is None
    assert m["mean_kbps"] == pytest.approx(
        (56 + 128 + 224) * 3 / 9
    )  # L3 MPEG-1 indexes 4/9/12
    m = M3.parse_mp3_meta(M3.encode_mp3_fixture(n_frames=10, xing=True))
    assert m["xing_frames"] == 11 == m["n_frames"]


def test_id3v1_trailer_is_skipped():
    payload = M3.encode_mp3_fixture(n_frames=6) + b"TAG" + bytes(125)
    m = M3.parse_mp3_meta(payload)
    assert m["n_frames"] == 6


def test_malformed_payloads_fail_loudly():
    with pytest.raises(NotImplementedError):
        M3.parse_mp3_meta(b"OggS this is not mpeg")
    p = M3.encode_mp3_fixture(n_frames=5)
    with pytest.raises(ValueError, match="overruns|whole frame"):
        M3.parse_mp3_meta(p[:-3])
    b = bytearray(p)
    b[2] &= 0x0F  # bitrate index -> 0
    with pytest.raises(ValueError, match="free-format"):
        M3.parse_mp3_meta(bytes(b))
    b = bytearray(p)
    b[2] |= 0xF0  # bitrate index -> 15
    with pytest.raises(ValueError, match="bitrate"):
        M3.parse_mp3_meta(bytes(b))
    # ID3v2 size claiming past the payload
    bad = b"ID3" + bytes([4, 0, 0]) + bytes([0, 0, 0x7F, 0x7F]) + b"x"
    with pytest.raises(ValueError, match="exceeds payload"):
        M3.parse_mp3_meta(bad)


def test_mp3_meta_seam_mixed_with_err_rows(spark):
    media = M3.synthetic_mp3_media(spark, n=12)
    rows = {r.media_id: r for r in M3.mp3_meta(media).collect()}
    assert len(rows) == 12
    for i in range(10):
        r = rows[i]
        assert r.err is None, (i, r.err)
        assert r.n_frames >= 6
        assert r.last_frame_end > r.first_frame_off
        if i % 4 == 3:
            assert r.is_vbr
        if i % 4 == 2:
            assert r.xing_frames == r.n_frames
    assert "free-format" in rows[10].err
    assert rows[11].err is not None
