"""Multimodal operators over binary media columns.

Every operator is ``mapInPandas`` (Arrow-batched; one Python call per
~10k-row batch, not per row), preserves partitioning (narrow — no
shuffle), and returns typed columns. At 100 TB: media bytes dominate
row size, so ops that don't need pixels (metadata filters, joins)
must run BEFORE these — Parquet column pruning then skips the binary
column entirely at scan time.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from openmetrics_spark.multimodal import codecs

MEDIA_METADATA = T.StructType(
    [
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("data", T.BinaryType(), True),
        T.StructField("metadata", MEDIA_METADATA, True),
    ]
)


def synthetic_media(
    spark: SparkSession, n: int, kind: str, seed: int = 5
) -> DataFrame:
    """Deterministic toy media table (RAW codec) for tests/benchmarks.
    Generated DISTRIBUTED: ids come from ``spark.range`` and bytes are
    built per-partition in mapInPandas — no driver-side matzo of n
    blobs."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                rng = np.random.RandomState(seed + int(mid))
                if kind == "image":
                    w, h, c = 32 + int(mid) % 3 * 16, 24 + int(mid) % 2 * 8, 3
                    px = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)
                    data = codecs.encode_image(px)
                    meta = (w, h, c, None, None, None, "rawi")
                elif kind == "audio":
                    rate = 16000
                    samples = (rng.randn(rate // 10) * 3000).astype("<i2")
                    data = codecs.encode_audio(samples, rate)
                    meta = (None, None, None, rate, 100, None, "rawa")
                elif kind == "video":
                    w, h, nf = 16, 12, 8 + int(mid) % 5
                    frames = rng.randint(0, 256, size=(nf, h, w), dtype=np.uint8)
                    data = codecs.encode_video(frames)
                    meta = (w, h, 1, None, None, nf, "rawv")
                else:
                    raise ValueError(kind)
                rows.append((int(mid), kind, bytearray(data), meta))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "data", "metadata"]
            )

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mean_px", T.DoubleType(), True),
        T.StructField("std_px", T.DoubleType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def decode_stats(media: DataFrame) -> DataFrame:
    """Decode images and emit per-image pixel statistics — the
    feature-extraction shape (decode → ndarray → reduce)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                px = codecs.decode_image(bytes(data))
                out.append(
                    (
                        int(mid),
                        float(px.mean()),
                        float(px.std()),
                        int(px.shape[1]),
                        int(px.shape[0]),
                    )
                )
            yield pd.DataFrame(
                out, columns=["media_id", "mean_px", "std_px", "width", "height"]
            )

    return media.select("media_id", "data").mapInPandas(extract, _STATS_SCHEMA)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize, re-encoded to the same binary format —
    the canonical "normalize a crawl to training resolution" op."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("data", T.BinaryType(), True),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                px = codecs.decode_image(bytes(data))
                h, w = px.shape[:2]
                yi = (np.arange(out_h) * h // out_h).astype(int)
                xi = (np.arange(out_w) * w // out_w).astype(int)
                resized = px[np.ix_(yi, xi)] if px.ndim == 2 else px[np.ix_(yi, xi)]
                rows.append((int(mid), bytearray(codecs.encode_image(resized))))
            yield pd.DataFrame(rows, columns=["media_id", "data"])

    return media.select("media_id", "data").mapInPandas(resize, out_schema)


_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """PCM features: RMS energy + zero-crossing count (the cheap
    audio-quality filters a corpus pipeline runs before expensive
    transcription)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                samples, rate = codecs.decode_audio(bytes(data))
                x = samples.astype(np.float64)
                rms = float(np.sqrt((x**2).mean())) if len(x) else 0.0
                zc = int(((x[:-1] * x[1:]) < 0).sum()) if len(x) > 1 else 0
                rows.append((int(mid), rms, zc, int(rate)))
            yield pd.DataFrame(
                rows, columns=["media_id", "rms", "zero_crossings", "sample_rate"]
            )

    return media.select("media_id", "data").mapInPandas(extract, _AUDIO_SCHEMA)


def frame_sample(media: DataFrame, every_n: int) -> DataFrame:
    """Sample every n-th frame of each video, one row per kept frame
    (the pretraining frame-extraction shape; explode happens INSIDE
    the pandas batch so the binary blob is decoded once per video)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_index", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                frames = codecs.decode_video(bytes(data))
                for i in range(0, frames.shape[0], every_n):
                    rows.append(
                        (int(mid), i, bytearray(codecs.encode_image(frames[i])))
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_index", "frame"])

    return media.select("media_id", "data").mapInPandas(sample, out_schema)
