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


@pytest.mark.parametrize("box", [b"stts", b"stsz", b"stsc", b"stsd", b"mdia"])
def test_missing_required_box_is_valueerror(box):
    """ADVICE r11 (high): a structurally-valid MP4 missing a required box
    must raise ValueError (inside DECODE_ERRORS), never TypeError from a
    None subscript — one bad file must not kill a 100 TB Spark task."""
    payload = MP.encode_mp4_fixture(n_frames=6).replace(box, b"free", 1)
    with pytest.raises(ValueError, match="missing"):
        MP.parse_mp4_meta(payload)


def test_uniform_stsz_count_bomb_is_bounded():
    """ADVICE r11 (medium): a corruption-flipped 32-bit sample count in a
    uniform-stsz box must be rejected BEFORE allocating count-sized
    lists — a few-KB payload must never demand GBs of executor memory."""
    payload = bytearray(MP.encode_mp4_fixture(n_frames=4, audio_frames=3))
    # the audio track's stsz is the uniform one (sample_size != 0)
    at = len(payload)
    while True:
        at = bytes(payload).rindex(b"stsz", 0, at)
        p = at + 4 + 4  # ver/flags
        uniform = int.from_bytes(payload[p : p + 4], "big")
        if uniform:
            break
    count_at = p + 4
    payload[count_at : count_at + 4] = (0x40000000).to_bytes(4, "big")
    with pytest.raises(ValueError, match="payload"):
        MP.parse_mp4_meta(bytes(payload))


def test_multitrack_audio_and_uniform_stsz():
    """r11 task #7: second (audio) trak parses alongside video — uniform
    stsz expansion, byte-exact audio sample ranges, per-track metadata."""
    payload = MP.encode_mp4_fixture(n_frames=5, audio_frames=7, seed=3)
    m = MP.parse_mp4_meta(payload)
    assert m["n_tracks"] == 2
    vid, aud = m["tracks"]
    assert (vid["handler"], aud["handler"]) == ("vide", "soun")
    assert (vid["track_id"], aud["track_id"]) == (1, 2)
    # top-level keys mirror the video track
    assert m["codec"] == vid["codec"] == "avc1"
    assert aud["codec"] == "mp4a"
    assert aud["timescale"] == 48000
    assert aud["n_frames"] == 7
    assert aud["duration_s"] == pytest.approx(7 * 1024 / 48000)
    assert aud["sample_sizes"] == [MP.AUDIO_SAMPLE_SIZE] * 7
    # audio samples live right after the video frames, byte-exact
    for i in range(7):
        off = aud["sample_offsets"][i]
        got = payload[off : off + MP.AUDIO_SAMPLE_SIZE]
        assert got == MP._audio_bytes(i, 3)
    # video ranges are unchanged by the second track
    for i in range(5):
        assert MP.read_frame(payload, m, i) == MP._frame_bytes(i, 3)
    # audio decode times: 1024-tick AAC-style cadence, no edit list
    assert aud["sample_times"] == [1024 * i for i in range(7)]


def test_elst_media_time_shifts_sample_times():
    """r11 task #7: a normal edit's media_time enters the media timeline
    late — every presentation timestamp shifts down by media_time."""
    delta = 12800 // 25
    payload = MP.encode_mp4_fixture(n_frames=6, elst_media_time=delta)
    m = MP.parse_mp4_meta(payload)
    assert m["sample_times"] == [delta * (i - 1) for i in range(6)]
    assert m["first_pts_s"] == pytest.approx(-delta / 12800)
    # byte ranges are orthogonal to edits
    for i in range(6):
        assert MP.read_frame(payload, m, i) == MP._frame_bytes(i, 0)


def test_elst_empty_edit_delays_presentation():
    """An empty edit (media_time == -1) delays the whole track by its
    segment_duration, converted movie→track timescale."""
    payload = MP.encode_mp4_fixture(
        n_frames=4, timescale=12800, elst_empty_ms=200
    )
    m = MP.parse_mp4_meta(payload)
    delay = 200 * 12800 // 1000  # 200 ms in track ticks
    delta = 12800 // 25
    assert m["sample_times"] == [delay + delta * i for i in range(4)]
    assert m["first_pts_s"] == pytest.approx(0.2)


def test_elst_empty_plus_media_time_compose():
    payload = MP.encode_mp4_fixture(
        n_frames=3, elst_empty_ms=100, elst_media_time=512
    )
    m = MP.parse_mp4_meta(payload)
    delay = 100 * 12800 // 1000
    assert m["sample_times"][0] == delay - 512


def test_decode_video_routes_mp4_and_pvid():
    mp = M.decode_video(MP.encode_mp4_fixture(n_frames=5, width=32, height=24))
    assert (mp["n_frames"], mp["width"], mp["height"]) == (5, 32, 24)
    assert mp["duration_s"] == pytest.approx(5 * 512 / 12800)
    pv = M.decode_video(M.synthesize_video(3))
    assert pv["n_frames"] == 3
    # AVI routes natively now (r12, functions/avi.py) — a truncated one
    # fails loudly through the same contained-error channel
    with pytest.raises(ValueError):
        M.decode_video(b"RIFF\x10\x00\x00\x00AVI LIST")
    # MKV routes natively too (r12, functions/mkv.py)
    with pytest.raises(ValueError):
        M.decode_video(b"\x1aE\xdf\xa3....")  # truncated EBML fails loudly
    with pytest.raises(NotImplementedError):
        M.decode_video(b"FLV\x01....")  # FLV still needs ffmpeg


def test_mp4_meta_seam_mixed_with_err_rows(spark):
    media = MP.synthetic_mp4_media(spark, n=12)
    rows = {r.media_id: r for r in MP.mp4_meta(media).collect()}
    assert len(rows) == 12
    for i in range(10):
        r = rows[i]
        assert r.err is None
        assert r.codec == ("avc1", "hev1", "av01")[i % 3]
        assert r.n_frames == 3 + (i % 5)
        assert r.width == 32 + 16 * (i % 3)
        # planned frame ranges stay inside the payload's mdat span
        assert r.first_frame_off == 32  # after the 28-byte ftyp + 8 hdr + 4
        assert r.last_frame_end - r.first_frame_off == r.frame_bytes
        # two-track rows expose the audio side; others stay null
        if i % 4 == 1:
            assert r.n_tracks == 2 and r.audio_codec == "mp4a"
            assert r.audio_n_frames == 4 + i % 3
        else:
            assert r.n_tracks == 1 and r.audio_codec is None
    # row 5: elst media-time edit → first pts goes negative by one frame
    assert rows[5].first_pts_s == pytest.approx(-(15360 // 30) / 15360)
    # row 9: empty-edit delay → first pts = +200 ms
    assert rows[9].first_pts_s == pytest.approx(0.2)
    assert rows[0].first_pts_s == 0.0
    # both err-channel shapes: missing required box; mid-moov truncation
    assert rows[10].err is not None and "missing stts" in rows[10].err
    assert rows[11].err is not None and "MP4" in rows[11].err
