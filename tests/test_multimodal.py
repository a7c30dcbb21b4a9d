"""Tests for multimodal binary-column plumbing (decode stubbed)."""

from __future__ import annotations

import pytest

from pixels_spark.catalog import load_table
from pixels_spark.functions import multimodal as M


def test_decode_stubs_raise():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        M.decode_audio(b"RIFF")


def test_media_schema_and_feature_extraction(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = M.documents_as_media(docs)
    assert [(f.name, f.dataType) for f in media.schema] == [
        (f.name, f.dataType) for f in M.MEDIA_SCHEMA
    ]
    feats = M.extract_features(media)
    assert [(f.name, f.dataType) for f in feats.schema] == [
        (f.name, f.dataType) for f in M.FEATURE_SCHEMA
    ]
    rows = {r.media_id: r for r in feats.collect()}
    # spot-check against the same extractor run driver-side
    for r in docs.collect():
        payload = r.text.encode("utf-8")
        n, checksum, mean = M.fake_feature_extractor(payload)
        got = rows[r.doc_id]
        assert got.n_bytes == n
        assert got.checksum == checksum
        assert got.feat_mean == pytest.approx(mean)


def test_mixed_kinds_and_decode_dispatch(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(30)
    media = M.documents_as_media(docs, kind="mixed")
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    # feature extraction is kind-agnostic plumbing — runs over all kinds
    feats = M.extract_features(media)
    assert feats.count() == 30
    # decode dispatch: registered kinds raise the stub error, unknown kinds
    # a clear ValueError
    with pytest.raises(NotImplementedError):
        M.decode("image", b"x")
    with pytest.raises(NotImplementedError):
        M.decode("audio", b"x")
    with pytest.raises(ValueError):
        M.decode("hologram", b"x")


def test_ppm_decoder_roundtrip():
    p = M.synthesize_ppm(7, 5, seed=3)
    d = M.decode_ppm(p)
    assert (d["width"], d["height"], d["maxval"], d["n_pixels"]) == (7, 5, 255, 35)
    # comments + arbitrary whitespace in header parse too
    p2 = b"P6 # c\n# another\n 3\t2\n255\n" + bytes(18)
    d2 = M.decode_ppm(p2)
    assert (d2["width"], d2["height"]) == (3, 2)
    with pytest.raises(ValueError):
        M.decode_ppm(b"P6\n3 2\n255\n\x00\x00")  # truncated body


def test_wav_decoder_roundtrip():
    p = M.synthesize_wav(sample_rate=16000, n_samples=1600, channels=2)
    d = M.decode_wav(p)
    assert d["sample_rate"] == 16000
    assert d["channels"] == 2
    assert d["bits_per_sample"] == 16
    assert d["n_samples"] == 1600
    assert d["duration_s"] == pytest.approx(0.1)
    with pytest.raises(ValueError):
        M.decode_wav(b"RIFF\x00\x00\x00\x00WAVE")  # no fmt/data chunks


def test_media_features_real_decode_distributed(spark):
    """The mapInPandas seam must run the REAL WAV/PPM decoders and surface
    undecodable payloads as err rows, not task failures."""
    media = M.synthetic_media(spark, n=32)
    bad = spark.createDataFrame(
        [(999, "image", b"\x89PNG not a ppm", "{}"),
         (998, "hologram", b"??", "{}")],
        M.MEDIA_SCHEMA,
    )
    feats = {r.media_id: r for r in M.media_features(media.union(bad)).collect()}
    assert len(feats) == 34
    for i in range(32):
        r = feats[i]
        assert r.err is None, r
        if i % 2 == 0:
            assert r.width == 4 + (i % 8) and r.height == 3 + (i % 5)
            assert r.sample_rate is None
        else:
            assert r.sample_rate == 8000 * (1 + i % 3)
            assert r.duration_s == pytest.approx(0.1)
            assert r.width is None
    assert "NotImplementedError" in feats[999].err
    assert "ValueError" in feats[998].err
