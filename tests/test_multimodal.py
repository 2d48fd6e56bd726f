"""Real-codec multimodal path: numpy BMP/PPM/PGM/WAV parsers, decode
stage, real featurize, resize. (The fake-decoder plumbing tests live in
test_dedup_similarity.py.)"""

from __future__ import annotations

import numpy as np
import pytest

from cognitive_score_bigdata_spark.operators import codecs
from cognitive_score_bigdata_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    audio_windows,
    decode_media,
    extract_features,
    resize_images,
)

RNG = np.random.default_rng(7)
PX = RNG.integers(0, 256, (6, 9, 3), dtype=np.uint8)
GRAY = RNG.integers(0, 256, (5, 4), dtype=np.uint8)
SAMPLES = RNG.integers(-32768, 32767, (250,)).astype(np.int16)


def test_codec_round_trips():
    for enc, fmt in [(codecs.encode_bmp, "bmp"), (codecs.encode_ppm, "ppm")]:
        d = codecs.decode(enc(PX))
        assert (d["format"], d["width"], d["height"]) == (fmt, 9, 6)
        assert (d["pixels"].reshape(PX.shape) == PX).all()
    g = codecs.decode(codecs.encode_ppm(GRAY))
    assert g["format"] == "pgm" and (g["pixels"][:, :, 0] == GRAY).all()
    w = codecs.decode(codecs.encode_wav(SAMPLES, 8000))
    assert w["n_samples"] == 250 and w["duration_ms"] == 31
    assert (w["samples"][:, 0] == SAMPLES).all()


def test_codec_rejects_unknown():
    with pytest.raises(ValueError, match="unrecognized"):
        codecs.decode(b"\x89PNG\r\n\x1a\n plus padding bytes")
    with pytest.raises(ValueError, match="24bpp"):
        # valid BMP magic but 32bpp header
        bad = bytearray(codecs.encode_bmp(PX))
        bad[28] = 32
        codecs.parse_bmp(bytes(bad))


def _media(spark):
    rows = [
        (1, "image", codecs.encode_bmp(PX), (None, None, None, "bmp")),
        (2, "image", codecs.encode_ppm(GRAY), (None, None, None, "pgm")),
        (3, "audio", codecs.encode_wav(SAMPLES, 8000), (None, None, None, "wav")),
        (4, "image", b"garbage not a real payload", (None, None, None, "?")),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_media_stage(spark):
    rows = {r["media_id"]: r for r in decode_media(_media(spark)).collect()}
    assert (rows[1]["format"], rows[1]["width"], rows[1]["height"]) == ("bmp", 9, 6)
    assert rows[1]["n_channels"] == 3
    assert (rows[2]["format"], rows[2]["n_channels"]) == ("pgm", 1)
    assert rows[3]["sample_rate"] == 8000 and rows[3]["n_samples"] == 250
    assert rows[3]["duration_ms"] == 31
    # malformed payload dead-letters instead of failing the job
    assert rows[4]["error"] is not None and rows[4]["format"] is None


def test_real_featurize_is_content_based(spark):
    """decoder='real' must featurize decoded CONTENT: the same pixels
    through two different containers (BMP vs PPM) give identical
    features, though the raw bytes differ."""
    rows = [
        (1, "image", codecs.encode_bmp(PX), (None, None, None, "bmp")),
        (2, "image", codecs.encode_ppm(PX), (None, None, None, "ppm")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {
        r["media_id"]: r["features"]
        for r in extract_features(media, decoder="real").collect()
    }
    assert feats[1] == feats[2]
    assert abs(sum(feats[1]) - 1.0) < 1e-5  # normalized histogram
    # while the fake (byte-histogram) decoder sees different bytes
    fake = {
        r["media_id"]: r["features"]
        for r in extract_features(media, decoder="fake").collect()
    }
    assert fake[1] != fake[2]


def test_audio_windows(spark):
    """8000 Hz × 250 samples = 31.25 ms of audio → with 25 ms windows and
    10 ms hop: window 200 samples, hop 80, n_win = (250-200)//80+1 = 1.
    A constant full-scale signal has rms == peak == 1."""
    const = np.full(250, 32767, dtype=np.int16)
    rows = [
        (1, "audio", codecs.encode_wav(SAMPLES, 8000), (None, None, None, "wav")),
        (2, "audio", codecs.encode_wav(const, 8000), (None, None, None, "wav")),
        (3, "image", codecs.encode_bmp(PX), (None, None, None, "bmp")),  # skipped
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = audio_windows(media, window_ms=25, hop_ms=10).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == {1, 2}
    assert len(by_id[1]) == 1 and by_id[1][0]["start_ms"] == 0
    w2 = by_id[2][0]
    assert abs(w2["rms"] - 32767 / 32768) < 1e-9
    assert abs(w2["peak"] - 32767 / 32768) < 1e-9
    # windows of the random signal: rms <= peak <= 1
    w1 = by_id[1][0]
    assert 0 < w1["rms"] <= w1["peak"] <= 1.0


def test_resize_images(spark):
    out = {r["media_id"]: r for r in resize_images(_media(spark), 4, 3).collect()}
    assert set(out) == {1, 2}  # audio + garbage rows dropped
    for r in out.values():
        d = codecs.decode(bytes(r["payload"]))
        assert (d["width"], d["height"]) == (4, 3)
    # nearest-neighbor: resized pixels are a subset gather of the source
    d1 = codecs.decode(bytes(out[1]["payload"]))
    yi = (np.arange(3) * 6 // 3).clip(0, 5)
    xi = (np.arange(4) * 9 // 4).clip(0, 8)
    assert (d1["pixels"] == PX[yi][:, xi]).all()


def test_y4m_codec_round_trip_and_stride():
    fr = (np.arange(4 * 6 * 8, dtype=np.uint32) % 256).astype(np.uint8).reshape(
        4, 6, 8
    )
    p = codecs.encode_y4m(fr, (24, 1))
    assert codecs.sniff_format(p) == "y4m"
    d = codecs.parse_y4m(p)
    assert (d["width"], d["height"], d["n_frames"], d["fps_num"]) == (8, 6, 4, 24)
    assert (d["y_frames"] == fr).all()
    d2 = codecs.parse_y4m(p, frame_stride=3)
    assert d2["frame_indices"] == [0, 3]
    assert (d2["y_frames"] == fr[[0, 3]]).all()


def test_y4m_parses_420_luma():
    # A 4:2:0 stream carries Y + quarter-res U,V; the parser must skip
    # chroma and land on the next FRAME marker correctly.
    w, h, n = 4, 2, 3
    y = np.full((h, w), 77, np.uint8)
    frame = y.tobytes() + bytes([128] * (w * h // 2))  # U+V planes
    p = f"YUV4MPEG2 W{w} H{h} F25:1 C420jpeg\n".encode() + b"".join(
        b"FRAME\n" + frame for _ in range(n)
    )
    d = codecs.parse_y4m(p)
    assert d["n_frames"] == n and (d["y_frames"] == 77).all()


def test_y4m_rejects_corruption():
    fr = np.zeros((2, 2, 2), np.uint8)
    p = codecs.encode_y4m(fr)
    with pytest.raises(ValueError, match="truncated"):
        codecs.parse_y4m(p[:-2])
    with pytest.raises(ValueError, match="not a Y4M"):
        codecs.parse_y4m(b"garbage")
    with pytest.raises(ValueError, match="colorspace"):
        codecs.parse_y4m(b"YUV4MPEG2 W2 H2 C444\nFRAME\n" + bytes(12))


def test_video_frames_skips_unparseable(spark):
    from cognitive_score_bigdata_spark.operators.multimodal import video_frames

    good = codecs.encode_y4m(np.full((2, 2, 3), 9, np.uint8))
    rows = [(1, bytearray(good)), (2, bytearray(b"not a video")), (3, None)]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = video_frames(media, frame_stride=1).collect()
    assert {r["media_id"] for r in out} == {1}
    assert [r["mean_luma"] for r in out] == [9.0, 9.0]
