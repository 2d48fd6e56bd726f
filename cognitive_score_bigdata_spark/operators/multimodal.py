"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video are opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so payload bytes never cross the
Python boundary row-at-a-time.

The actual codec step is STUBBED (this container ships no image/audio
libraries): ``decoder='real'`` raises NotImplementedError where
PIL/ffmpeg would be called; ``decoder='fake'`` produces deterministic
pseudo-features derived from the payload bytes, so the Spark-side
contract — schema, batching, partitioning, UDF signatures — is real and
fully tested, and swapping in a real codec changes one function body.

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

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if decoder == "real":
                raise NotImplementedError(
                    "real codecs (PIL/ffmpeg) are not available in this "
                    "environment; use decoder='fake'"
                )
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
                        lambda p: _fake_features(p).tolist()
                    ),
                }
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        run, out_schema
    )


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling stub: one output row per sampled 'frame'
    (payload chunk). Exercises the 1→N mapInPandas fan-out shape used by
    real frame extraction."""
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
