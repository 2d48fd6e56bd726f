"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video are opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so payload bytes never cross the
Python boundary row-at-a-time.

Codecs: ``decoder='real'`` decodes BMP / PPM / PGM / WAV with the
pure-numpy parsers in :mod:`operators.codecs` (no external libraries
needed) and featurizes the DECODED content — pixel-luminance histogram
for images, sample-amplitude histogram for audio; formats beyond those
(JPEG/MP4/...) raise with a clear message since PIL/ffmpeg don't exist
in this environment. ``decoder='fake'`` (default) keeps the
deterministic byte-histogram stand-in, useful when payloads are opaque
test bytes rather than valid media.

At scale: payloads should be stored in their own parquet row-groups
(column pruning keeps metadata-only queries from touching bytes), and
decode stages sized by ``spark.sql.execution.arrow.maxRecordsPerBatch``
so a batch of payloads fits executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from cognitive_score_bigdata_spark.operators import codecs

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

N_FEATURES = 32


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a codec+featurizer: normalized byte
    histogram. Stable across machines — digest-seeded, content-derived."""
    if payload is None or len(payload) == 0:
        return np.zeros(N_FEATURES, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 3, minlength=N_FEATURES).astype(np.float32)
    return hist / max(len(arr), 1)


def _real_features(payload: bytes) -> np.ndarray:
    """Decode with the numpy codecs and featurize the CONTENT:
    images → normalized luminance histogram (N_FEATURES bins),
    audio → normalized |amplitude| histogram over the int16 range."""
    if payload is None or len(payload) == 0:
        return np.zeros(N_FEATURES, dtype=np.float32)
    d = codecs.decode(bytes(payload))
    if "pixels" in d:
        px = d["pixels"].astype(np.float32)
        lum = px.mean(axis=2).ravel()  # grayscale: channel mean
        hist = np.bincount(
            (lum * N_FEATURES / 256.0).astype(np.int64).clip(0, N_FEATURES - 1),
            minlength=N_FEATURES,
        ).astype(np.float32)
        return hist / max(lum.size, 1)
    amp = np.abs(d["samples"].astype(np.float32)).ravel()
    hist = np.bincount(
        (amp * N_FEATURES / 32769.0).astype(np.int64).clip(0, N_FEATURES - 1),
        minlength=N_FEATURES,
    ).astype(np.float32)
    return hist / max(amp.size, 1)


def extract_features(
    media: DataFrame, decoder: str = "fake"
) -> DataFrame:
    """Decode + featurize: (media_id, media_type, n_bytes, sha256,
    features array<float>). The shuffle-free scan→UDF→project shape is
    what a real embedding-extraction stage compiles to."""
    out_schema = (
        "media_id long, media_type string, n_bytes long, sha256 string, "
        f"features array<float>"
    )

    featurize = _real_features if decoder == "real" else _fake_features

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(
                        lambda p: 0 if p is None else len(p)
                    ).astype("int64"),
                    # sha256, not sha1: DuckDB ships sha256 so the
                    # whole Arrow path is oracle-comparable row-for-row
                    "sha256": payloads.map(
                        lambda p: hashlib.sha256(p or b"").hexdigest()
                    ),
                    "features": payloads.map(
                        lambda p: featurize(p).tolist()
                    ),
                }
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        run, out_schema
    )


def decode_media(media: DataFrame) -> DataFrame:
    """REAL decode: payload → typed media metadata, one row per input.

    BMP/PPM/PGM/WAV are parsed with the numpy codecs; anything else (or a
    corrupt payload) becomes a dead-letter row with ``error`` set rather
    than failing the job — at 100 TB a scan WILL hit malformed bytes.
    Arrow-batched ``mapInPandas``, no shuffle.
    """
    out_schema = (
        "media_id long, format string, width int, height int, "
        "n_channels int, sample_rate int, n_samples long, duration_ms int, "
        "error string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                base = dict.fromkeys(
                    ["format", "width", "height", "n_channels",
                     "sample_rate", "n_samples", "duration_ms", "error"]
                )
                base["media_id"] = mid
                try:
                    d = codecs.decode(bytes(payload) if payload is not None else b"")
                    base["format"] = d["format"]
                    base["n_channels"] = d["n_channels"]
                    if "pixels" in d:
                        base["width"], base["height"] = d["width"], d["height"]
                    else:
                        base["sample_rate"] = d["sample_rate"]
                        base["n_samples"] = d["n_samples"]
                        base["duration_ms"] = d["duration_ms"]
                except ValueError as exc:
                    base["error"] = str(exc)
                rows.append(base)
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(run, out_schema)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbor resize of decodable images, re-encoded as PPM:
    (media_id, width, height, payload). The resize itself is two numpy
    index gathers per image — no interpolation library needed; rows whose
    payloads aren't images are dropped (audio can't be resized)."""
    out_schema = "media_id long, width int, height int, payload binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "width": [], "height": [], "payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    d = codecs.decode(bytes(payload) if payload is not None else b"")
                except ValueError:
                    continue
                if "pixels" not in d:
                    continue
                px = d["pixels"]
                yi = (np.arange(height) * d["height"] // height).clip(0, d["height"] - 1)
                xi = (np.arange(width) * d["width"] // width).clip(0, d["width"] - 1)
                resized = px[yi][:, xi]
                rows["media_id"].append(mid)
                rows["width"].append(width)
                rows["height"].append(height)
                rows["payload"].append(codecs.encode_ppm(resized))
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(run, out_schema)


def audio_windows(
    media: DataFrame, window_ms: int = 25, hop_ms: int = 10
) -> DataFrame:
    """REAL audio frame extraction: decode WAV payloads and emit one row
    per analysis window (the classic 25ms/10ms speech-feature framing):
    (media_id, win_idx, start_ms, rms, peak). Non-WAV payloads are
    skipped. 1→N ``mapInPandas`` fan-out; windowing is a numpy stride
    trick, no Python per-sample loop."""
    out_schema = (
        "media_id long, win_idx int, start_ms int, rms double, peak double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "win_idx", "start_ms", "rms", "peak")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    d = codecs.decode(bytes(payload) if payload is not None else b"")
                except ValueError:
                    continue
                if d["format"] != "wav":
                    continue
                mono = d["samples"].astype(np.float64).mean(axis=1) / 32768.0
                wlen = max(int(d["sample_rate"] * window_ms / 1000), 1)
                hop = max(int(d["sample_rate"] * hop_ms / 1000), 1)
                n_win = max((len(mono) - wlen) // hop + 1, 0)
                if n_win == 0:
                    continue
                idx = np.arange(wlen)[None, :] + hop * np.arange(n_win)[:, None]
                frames = mono[idx]  # (n_win, wlen)
                rows["media_id"].extend([mid] * n_win)
                rows["win_idx"].extend(range(n_win))
                rows["start_ms"].extend(
                    (hop * np.arange(n_win) * 1000 // d["sample_rate"]).tolist()
                )
                rows["rms"].extend(np.sqrt((frames**2).mean(axis=1)).tolist())
                rows["peak"].extend(np.abs(frames).max(axis=1).tolist())
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(run, out_schema)


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Generic frame sampling for UNKNOWN containers: one output row per
    payload chunk (the 1→N mapInPandas fan-out shape). For real frame
    extraction from a real container, see :func:`video_frames` (Y4M)."""
    out_schema = "media_id long, frame_idx int, frame_bytes binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_bytes": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                step = max(len(payload) // n_frames, 1)
                for i in range(min(n_frames, len(payload))):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_bytes"].append(bytes(payload[i * step : i * step + step]))
            yield pd.DataFrame(rows)

    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", "payload")
        .mapInPandas(run, out_schema)
    )


def video_frames(
    media: DataFrame, frame_stride: int = 1, id_col: str = "media_id"
) -> DataFrame:
    """REAL video frame sampling: parse Y4M payloads (pure-numpy codec,
    operators/codecs.py) and emit one row per ``frame_stride``-th frame
    with its luma statistics — the 1→N Arrow fan-out of real frame
    extraction, with sampling INSIDE the parse so skipped frames are
    never materialized. Unparseable payloads are skipped (the
    dead-letter path for decode errors is :func:`decode_media`).
    """
    out_schema = (
        f"{id_col} long, frame_idx int, width int, height int, "
        "n_frames int, mean_luma double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                id_col: [],
                "frame_idx": [],
                "width": [],
                "height": [],
                "n_frames": [],
                "mean_luma": [],
            }
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    v = codecs.parse_y4m(bytes(payload), frame_stride)
                except (ValueError, IndexError):
                    continue
                for k, frame in zip(v["frame_indices"], v["y_frames"]):
                    rows[id_col].append(mid)
                    rows["frame_idx"].append(k)
                    rows["width"].append(v["width"])
                    rows["height"].append(v["height"])
                    rows["n_frames"].append(v["n_frames"])
                    rows["mean_luma"].append(float(frame.mean()))
            yield pd.DataFrame(rows)

    return media.select(id_col, "payload").mapInPandas(run, out_schema)
