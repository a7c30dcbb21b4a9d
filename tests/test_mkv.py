"""MKV/WebM EBML demux tests (r12): the varint element walk must
recover doc type / timescale / duration / per-track metadata, plan
exact SimpleBlock frame byte ranges, and contain every malformed shape
(unknown-size elements, overruns, truncation) as err rows."""

from __future__ import annotations

import hashlib

import pytest

from pixels_spark.functions import mkv as MK


@pytest.mark.parametrize(
    "kw, codec",
    [
        ({}, "V_VP9"),
        ({"video_codec": b"V_AV1"}, "V_AV1"),
        ({"with_audio": True}, "V_VP9"),
        ({"doc_type": b"webm"}, "V_VP9"),
        ({"n_clusters": 3, "frames_per_cluster": 5}, "V_VP9"),
    ],
)
def test_walk_recovers_metadata(kw, codec):
    p = MK.encode_mkv_fixture(width=100, height=80, duration_s=3.25,
                              seed=2, **kw)
    m = MK.parse_mkv_meta(p)
    assert (m["width"], m["height"]) == (100, 80)
    assert m["video_codec"] == codec
    assert m["duration_s"] == pytest.approx(3.25)
    assert m["ts_scale"] == 1_000_000
    nc = kw.get("n_clusters", 2)
    fpc = kw.get("frames_per_cluster", 3)
    assert m["n_clusters"] == nc and m["n_video_frames"] == nc * fpc
    if kw.get("with_audio"):
        assert m["audio_codec"] == "A_OPUS" and m["audio_channels"] == 2
        assert m["n_tracks"] == 2 and m["n_blocks"] == 2 * nc * fpc
    if kw.get("doc_type") == b"webm":
        assert m["doc_type"] == "webm"


def test_frame_ranges_are_byte_exact():
    p = MK.encode_mkv_fixture(n_clusters=2, frames_per_cluster=4,
                              with_audio=True, seed=5)
    m = MK.parse_mkv_meta(p)
    total = 0
    for off, size in m["frame_ranges"]:
        assert len(p[off : off + size]) == size
        total += size
    assert total == m["frame_bytes"]
    assert m["first_frame_off"] == m["frame_ranges"][0][0]
    assert m["last_frame_end"] == sum(m["frame_ranges"][-1])


def test_golden_payload_pins():
    p = MK.encode_mkv_fixture(
        width=128, height=96, n_clusters=3, frames_per_cluster=2,
        duration_s=4.5, video_codec=b"V_AV1", with_audio=True, seed=7,
    )
    assert (len(p), hashlib.md5(p).hexdigest()) == (
        576, "d97b3ae65f384c1159c14fc2a026a934",
    )
    m = MK.parse_mkv_meta(p)
    assert (m["n_video_frames"], m["frame_bytes"]) == (6, 336)


def test_malformed_payloads_fail_loudly():
    good = MK.encode_mkv_fixture(seed=1)
    with pytest.raises(ValueError, match="EBML"):
        MK.parse_mkv_meta(b"\x00\x00\x00\x00" + good[4:])
    with pytest.raises(ValueError, match="overruns|truncated"):
        MK.parse_mkv_meta(good[:-17])
    bad = bytearray(good)
    at = good.index(b"\x1f\x43\xb6\x75") + 4
    bad[at] = 0xFF  # 1-byte unknown-size marker
    with pytest.raises(ValueError, match="unknown-size"):
        MK.parse_mkv_meta(bytes(bad))
    # segment with no tracks
    with pytest.raises(ValueError, match="no TrackEntry"):
        hdr_end = good.index(b"\x18\x53\x80\x67")
        MK.parse_mkv_meta(good[:hdr_end] + b"\x18\x53\x80\x67\x80")


def test_decode_video_routes_mkv():
    from pixels_spark.functions import multimodal as M

    p = MK.encode_mkv_fixture(width=50, height=40, n_clusters=2,
                              frames_per_cluster=3, duration_s=1.5)
    d = M.decode_video(p)
    assert (d["width"], d["height"], d["n_frames"]) == (50, 40, 6)
    assert d["duration_s"] == pytest.approx(1.5)


def test_mkv_meta_seam_mixed_with_err_rows(spark):
    media = MK.synthetic_mkv_media(spark, n=12)
    rows = {r.media_id: r for r in MK.mkv_meta(media).collect()}
    assert len(rows) == 12
    for i in range(10):
        r = rows[i]
        assert r.err is None, (i, r.err)
        assert r.width == 32 + 16 * (i % 4)
        assert r.n_video_frames == (1 + i % 3) * (2 + i % 4)
    assert rows[10].err is not None and "unknown-size" in rows[10].err
    assert rows[11].err is not None
