"""MP4 (ISO BMFF) metadata demux tests (VERDICT r10 task #2): the box
walk must recover codec id / timescale / frame count / duration / dims,
and the stsc/stco/stsz expansion must plan byte-exact per-frame ranges —
verified by reading every frame back through the planned offsets and
comparing against the encoder's deterministic payloads."""

from __future__ import annotations

import struct

import pytest

from pixels_spark.functions import mp4 as MP
from pixels_spark.functions import multimodal as M


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"n_frames": 1},                      # single frame, single chunk
        {"n_frames": 3},                      # exactly one chunk of 3
        {"n_frames": 4},                      # 3 + partial last chunk of 1
        {"n_frames": 23, "fps": 30, "timescale": 15360},
        {"codec": "hev1", "width": 320, "height": 240},
        {"codec": "av01", "fps": 24, "seed": 7},
    ],
)
def test_parse_recovers_encoder_params(kw):
    payload = MP.encode_mp4_fixture(**kw)
    m = MP.parse_mp4_meta(payload)
    n = kw.get("n_frames", 8)
    fps = kw.get("fps", 25)
    ts = kw.get("timescale", 12800)
    assert m["brand"] == "isom"
    assert m["codec"] == kw.get("codec", "avc1")
    assert m["handler"] == "vide"
    assert m["timescale"] == ts
    assert m["n_frames"] == n
    assert m["width"] == kw.get("width", 64)
    assert m["height"] == kw.get("height", 48)
    assert (m["track_width"], m["track_height"]) == (m["width"], m["height"])
    assert m["duration_s"] == pytest.approx(n * (ts // fps) / ts)
    # chunk layout 3,2,2,... with a possibly-partial tail
    assert m["n_chunks"] == 1 + max(0, -(-(n - 3) // 2))


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 8, 23])
def test_sample_table_plans_byte_exact_frame_ranges(n):
    seed = n * 3
    payload = MP.encode_mp4_fixture(n_frames=n, seed=seed)
    m = MP.parse_mp4_meta(payload)
    assert len(m["sample_offsets"]) == len(m["sample_sizes"]) == n
    for i in range(n):
        assert MP.read_frame(payload, m, i) == MP._frame_bytes(i, seed)
    # offsets strictly increasing and chunk-contiguous
    ends = [o + s for o, s in zip(m["sample_offsets"], m["sample_sizes"])]
    assert all(m["sample_offsets"][i + 1] >= ends[i] for i in range(n - 1))


def test_box_walker_largesize_and_to_end():
    inner = MP._box(b"free", b"x" * 4)
    large = struct.pack(">I", 1) + b"skip" + struct.pack(">Q", 16 + 4) + b"abcd"
    to_end = struct.pack(">I", 0) + b"tail" + b"rest of file"
    buf = inner + large + to_end
    boxes = list(MP._boxes(buf, 0, len(buf)))
    assert [t for t, _, _ in boxes] == [b"free", b"skip", b"tail"]
    t, b, e = boxes[1]
    assert buf[b:e] == b"abcd"
    t, b, e = boxes[2]
    assert e == len(buf)


def test_malformed_payloads_fail_loudly():
    payload = bytearray(MP.encode_mp4_fixture(n_frames=6))
    with pytest.raises(NotImplementedError):
        MP.parse_mp4_meta(b"\x1aE\xdf\xa3 matroska")  # MKV: not ISO BMFF
    with pytest.raises(ValueError):
        MP.parse_mp4_meta(bytes(payload[: len(payload) // 2]))  # mid-moov cut
    # stts/stsz disagreement: bump the stts run count field
    at = bytes(payload).index(b"stts") + 4 + 4 + 4  # fourcc+ver/flags+n_runs
    bad = bytearray(payload)
    bad[at + 3] += 1  # sample count 6 -> 7
    with pytest.raises(ValueError, match="disagree"):
        MP.parse_mp4_meta(bytes(bad))
    # stsc pointing past the stco chunk count
    at = bytes(payload).index(b"stsc") + 4 + 4 + 4
    bad = bytearray(payload)
    bad[at + 3] = 200  # first run's first_chunk -> 200
    with pytest.raises(ValueError):
        MP.parse_mp4_meta(bytes(bad))


def test_decode_video_routes_mp4_and_pvid():
    mp = M.decode_video(MP.encode_mp4_fixture(n_frames=5, width=32, height=24))
    assert (mp["n_frames"], mp["width"], mp["height"]) == (5, 32, 24)
    assert mp["duration_s"] == pytest.approx(5 * 512 / 12800)
    pv = M.decode_video(M.synthesize_video(3))
    assert pv["n_frames"] == 3
    with pytest.raises(NotImplementedError):
        M.decode_video(b"RIFF....AVI LIST")  # AVI still needs ffmpeg


def test_mp4_meta_seam_mixed_with_err_rows(spark):
    media = MP.synthetic_mp4_media(spark, n=12)
    rows = {r.media_id: r for r in MP.mp4_meta(media).collect()}
    assert len(rows) == 12
    for i in range(11):
        r = rows[i]
        assert r.err is None
        assert r.codec == ("avc1", "hev1", "av01")[i % 3]
        assert r.n_frames == 3 + (i % 5)
        assert r.width == 32 + 16 * (i % 3)
        # planned frame ranges stay inside the payload's mdat span
        assert r.first_frame_off == 32  # after the 28-byte ftyp + 8 hdr + 4
        assert r.last_frame_end - r.first_frame_off == r.frame_bytes
    assert rows[11].err is not None and "MP4" in rows[11].err
