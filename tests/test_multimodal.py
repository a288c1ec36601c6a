"""Multimodal plumbing: schemas, decode parity with the generator,
real byte-level features, frame-offset math, codec-stub error path."""

import pytest

from kg.multimodal import (
    _fake_payload,
    _parse_header,
    byte_histogram_features,
    decode_assets,
    gen_assets,
    sample_frames,
)


def test_decode_matches_generator(spark):
    assets = gen_assets(spark, 60)
    rows = decode_assets(assets).collect()
    assert len(rows) == 60
    for r in rows:
        w = 16 + (r["asset_id"] * 7) % 48
        h = 16 + (r["asset_id"] * 13) % 48
        assert (r["width"], r["height"]) == (w, h), r
        if r["kind"] == "image":
            assert r["n_frames"] == 1


def test_features_are_normalized_histograms(spark):
    rows = byte_histogram_features(gen_assets(spark, 30)).collect()
    for r in rows:
        assert len(r["features"]) == 8
        assert abs(sum(r["features"]) - 1.0) < 1e-9


def test_frame_sampling_offsets(spark):
    rows = sample_frames(gen_assets(spark, 60), every=4).collect()
    assert rows, "no video assets sampled"
    for r in rows:
        assert r["frame_idx"] % 4 == 0
        assert r["frame_offset"] == 10 + r["frame_idx"] * 64


def test_codec_stub_raises_on_real_payload():
    with pytest.raises(NotImplementedError):
        _parse_header(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)


def test_fake_payload_roundtrip():
    p = _fake_payload(7, "video")
    w, h, f = _parse_header(p)
    assert (w, h) == (16 + 49 % 48, 16 + 91 % 48)
    assert f == 1 + 7 % 24
