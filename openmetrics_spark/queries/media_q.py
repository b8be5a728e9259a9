"""Multimodal queries. Media derives deterministically from the
``documents`` table (text bytes → toy RAWI images), so the decode /
feature-extract path is exercised against driver tables — and because
the corpus is ASCII, the pixel math is exactly reproducible in SQL
(pixel value = byte value = ord(char)), giving the mapInPandas decode
a true value-level oracle. The audio/video ops run on synthetic
media (rows-only check: no SQL can demux the toy container)."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from openmetrics_spark.multimodal import codecs, ops
from openmetrics_spark.queries import register
from openmetrics_spark.tables import table

_SIDE = 32  # 32x32 grayscale = 1024 pixels per document


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text → RAWI image: first 1024 UTF-8 bytes as pixels,
    zero-padded — a deterministic stand-in for 'fetch + decode the
    image this document references'."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = np.zeros(_SIDE * _SIDE, dtype=np.uint8)
                b = text.encode("utf-8")[: _SIDE * _SIDE]
                raw[: len(b)] = np.frombuffer(b, dtype=np.uint8)
                rows.append(
                    (
                        int(doc_id),
                        "image",
                        bytearray(codecs.encode_image(raw.reshape(_SIDE, _SIDE))),
                        (_SIDE, _SIDE, 1, None, None, None, "rawi"),
                    )
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "data", "metadata"])

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(encode, ops.MEDIA_SCHEMA)


_IMAGE_STATS_ORACLE = f"""
WITH px AS (
  SELECT doc_id,
         list_transform(split(text[1:{_SIDE * _SIDE}], ''), x -> ord(x)) AS p,
         least(length(text), {_SIDE * _SIDE}) AS n
  FROM documents
)
SELECT doc_id,
       round(list_sum(p) / {_SIDE * _SIDE}.0, 6) AS mean_px,
       round(sqrt(
         list_sum(list_transform(p, x -> CAST(x AS DOUBLE) * x)) / {_SIDE * _SIDE}.0
         - (list_sum(p) / {_SIDE * _SIDE}.0) ^ 2
       ), 6) AS std_px
FROM px
"""


@register("multimodal_image_stats", oracle=_IMAGE_STATS_ORACLE, tags=("llm", "multimodal"))
def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary image column → Arrow-batched decode → per-image pixel
    stats. The SQL oracle recomputes the same pixels from the source
    bytes (ASCII: byte == ord(char)); zero-padding contributes zeros
    to both engines identically."""
    media = media_from_documents(spark, sf_dir)
    stats = ops.decode_stats(media)
    return stats.select(
        F.col("media_id").alias("doc_id"),
        F.round("mean_px", 6).alias("mean_px"),
        F.round("std_px", 6).alias("std_px"),
    )


@register("multimodal_av_features", tags=("llm", "multimodal"))
def multimodal_av_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio RMS/zero-crossing features + video frame-sampling counts
    over deterministic synthetic media — rows-only check (no SQL
    oracle can demux the binary container; the codec itself is
    covered by tests/test_multimodal.py)."""
    audio = ops.audio_features(ops.synthetic_media(spark, 64, "audio")).select(
        "media_id",
        F.lit("audio").alias("kind"),
        F.round("rms", 6).alias("metric_a"),
        F.col("zero_crossings").cast("double").alias("metric_b"),
    )
    frames = (
        ops.frame_sample(ops.synthetic_media(spark, 64, "video"), every_n=2)
        .groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "media_id",
            F.lit("video").alias("kind"),
            F.col("n").cast("double").alias("metric_a"),
            F.lit(0.0).alias("metric_b"),
        )
    )
    return audio.unionByName(frames)
