"""OGG page-walk metadata tests (r12, VERDICT r11 missing #2): the walk
must CRC-verify every page, reassemble packets through lacing values
(including >255-byte packets and packets spanning pages), extract
Vorbis/Opus id-header fields, and compute exact durations from granule
positions."""

from __future__ import annotations

import pytest

from pixels_spark.functions import ogg as OG


def test_vorbis_walk_and_duration():
    p = OG.encode_ogg_fixture(
        codec="vorbis", channels=2, sample_rate=44100,
        n_audio_packets=9, granule_step=1024, seed=2,
    )
    m = OG.parse_ogg_meta(p)
    assert (m["codec"], m["channels"], m["sample_rate"]) == ("vorbis", 2, 44100)
    assert m["n_packets"] == 11  # id + comment + 9 audio
    assert m["n_streams"] == 1 and m["eos"]
    assert m["duration_s"] == pytest.approx(9 * 1024 / 44100)
    # page offsets tile the payload
    assert m["page_offsets"][0] == 0
    assert all(
        m["page_offsets"][i] < m["page_offsets"][i + 1]
        for i in range(len(m["page_offsets"]) - 1)
    )


def test_opus_preskip_duration():
    p = OG.encode_ogg_fixture(
        codec="opus", sample_rate=48000, n_audio_packets=5, granule_step=960
    )
    m = OG.parse_ogg_meta(p)
    assert (m["codec"], m["pre_skip"]) == ("opus", 312)
    # opus granules tick at 48 kHz minus pre-skip (RFC 7845 §4)
    assert m["duration_s"] == pytest.approx((5 * 960 - 312) / 48000)


def test_packet_spans_pages():
    p = OG.encode_ogg_fixture(span_pages=True, n_audio_packets=12, seed=4)
    m = OG.parse_ogg_meta(p)
    assert m["n_packets"] == 14  # spanning must not double-count
    assert m["eos"]


def test_malformed_payloads_fail_loudly():
    with pytest.raises(NotImplementedError):
        OG.parse_ogg_meta(b"fLaC not an ogg stream")
    p = OG.encode_ogg_fixture()
    with pytest.raises(ValueError, match="exceeds payload"):
        OG.parse_ogg_meta(p[:-5])
    b = bytearray(p)
    b[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        OG.parse_ogg_meta(bytes(b))
    b = bytearray(p)
    b[30] ^= 0x01  # flip a lacing byte: CRC catches header corruption too
    with pytest.raises(ValueError):
        OG.parse_ogg_meta(bytes(b))


def test_ogg_meta_seam_mixed_with_err_rows(spark):
    media = OG.synthetic_ogg_media(spark, n=12)
    rows = {r.media_id: r for r in OG.ogg_meta(media).collect()}
    assert len(rows) == 12
    for i in range(10):
        r = rows[i]
        assert r.err is None, (i, r.err)
        assert r.codec == ("opus" if i % 3 == 2 else "vorbis")
        assert r.channels == 1 + i % 2
        assert r.n_packets == 2 + 6 + i
        assert r.eos
    assert "CRC" in rows[10].err
    assert rows[11].err is not None
