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
