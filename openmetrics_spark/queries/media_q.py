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


_A_MAX = 1024  # PCM samples per document
_V_FRAMES = 8  # 8 frames of 8x8 grayscale = 512 bytes per document
_V_SIDE = 8
_PCM_BIAS = 96  # sample = (byte - 96) * 256: ASCII corpus (32..126)
#                 straddles 96, so the sign alternates and
#                 zero-crossing counts are non-vacuous


def av_media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text → RAWA audio + RAWV video, deterministically:

    - audio: first 1024 bytes as int16 PCM, sample = (byte - 96) * 256
      (NOT zero-padded — the sample count is the text length, capped);
    - video: first 512 bytes as 8 frames of 8x8 grayscale pixels,
      zero-padded (short docs produce all-zero tail frames).

    The same stand-in-for-decode trick as ``media_from_documents``:
    the bytes are ASCII, so SQL can reconstruct every sample/pixel
    with ord(), giving the A/V mapInPandas path a value-level oracle.
    """

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(
                    text.encode("utf-8")[:_A_MAX], dtype=np.uint8
                ).astype(np.int32)
                pcm = ((b - _PCM_BIAS) * 256).astype(np.int16)
                rows.append(
                    (
                        int(doc_id),
                        "audio",
                        bytearray(codecs.encode_audio(pcm, 16000)),
                        (None, None, None, 16000, len(pcm), None, "rawa"),
                    )
                )
                vb = np.zeros(_V_FRAMES * _V_SIDE * _V_SIDE, dtype=np.uint8)
                vsrc = text.encode("utf-8")[: len(vb)]
                vb[: len(vsrc)] = np.frombuffer(vsrc, dtype=np.uint8)
                rows.append(
                    (
                        int(doc_id),
                        "video",
                        bytearray(
                            codecs.encode_video(
                                vb.reshape(_V_FRAMES, _V_SIDE, _V_SIDE)
                            )
                        ),
                        (_V_SIDE, _V_SIDE, 1, None, None, _V_FRAMES, "rawv"),
                    )
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "data", "metadata"])

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(encode, ops.MEDIA_SCHEMA)


_FRAME_PX = _V_SIDE * _V_SIDE

_AV_ORACLE = f"""
WITH b AS (
  SELECT doc_id,
         list_transform(split(text[1:{_A_MAX}], ''), x -> ord(x)) AS p,
         least(length(text), {_A_MAX}) AS n
  FROM documents
),
audio AS (
  SELECT doc_id, 'audio' AS kind,
         round(sqrt(
           list_sum(list_transform(p, x -> ((x - {_PCM_BIAS}.0) * 256) ^ 2)) / n
         ), 6) AS metric_a,
         CAST(len(list_filter(range(1, n),
                  i -> (p[i] - {_PCM_BIAS}) * (p[i + 1] - {_PCM_BIAS}) < 0))
              AS DOUBLE) AS metric_b
  FROM b WHERE n > 0
),
video AS (
  SELECT doc_id, 'video' AS kind,
         CAST(f AS DOUBLE) AS metric_a,
         round(list_sum(list_transform(range(1, {_FRAME_PX} + 1),
                  i -> CASE WHEN f * {_FRAME_PX} + i <= n
                            THEN p[f * {_FRAME_PX} + i] ELSE 0 END))
               / {_FRAME_PX}.0, 6) AS metric_b
  FROM b, (VALUES (0), (2), (4), (6)) s(f)
)
SELECT * FROM audio UNION ALL SELECT * FROM video
"""


@register("multimodal_av_features", oracle=_AV_ORACLE, tags=("llm", "multimodal"))
def multimodal_av_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio RMS + zero-crossings and sampled-frame mean pixels over
    document-derived media. The binary containers are decoded in
    Arrow-batched mapInPandas; the SQL oracle reconstructs every PCM
    sample and pixel from the source bytes (ASCII: byte == ord), so
    the whole decode → feature path is value-checked. Sums are exact
    (integer-valued doubles < 2^53), so rounding is engine-stable."""
    media = av_media_from_documents(spark, sf_dir)
    audio = ops.audio_features(
        media.filter(F.col("kind") == "audio")
    ).select(
        F.col("media_id").alias("doc_id"),
        F.lit("audio").alias("kind"),
        F.round("rms", 6).alias("metric_a"),
        F.col("zero_crossings").cast("double").alias("metric_b"),
    )
    # pack (doc, frame) into the decode id, then split it back out
    frames = ops.frame_sample(
        media.filter(F.col("kind") == "video"), every_n=2
    ).select(
        (F.col("media_id") * _V_FRAMES + F.col("frame_index")).alias("media_id"),
        F.col("frame").alias("data"),
    )
    video = ops.decode_stats(frames).select(
        (F.col("media_id") / _V_FRAMES).cast("long").alias("doc_id"),
        F.lit("video").alias("kind"),
        (F.col("media_id") % _V_FRAMES).cast("double").alias("metric_a"),
        F.round("mean_px", 6).alias("metric_b"),
    )
    return audio.unionByName(video)


# ---------------------------------------------------------------------------
# Resize path: normalize to "training resolution" then re-extract
# stats. Nearest-neighbor index math (src index = out_index * in / out,
# floored) is integer-exact, so SQL rebuilds the resized pixels from
# the source bytes and the whole decode → resize → re-encode → decode
# chain gets a value-level oracle.
# ---------------------------------------------------------------------------

_R_SIDE = 8  # 32x32 -> 8x8: index stride 4

_RESIZE_ORACLE = f"""
WITH px AS (
  SELECT doc_id,
         list_transform(split(text[1:{_SIDE * _SIDE}], ''), x -> ord(x)) AS p,
         least(length(text), {_SIDE * _SIDE}) AS n
  FROM documents
), r AS (
  SELECT doc_id, list_transform(range({_R_SIDE * _R_SIDE}),
      k -> CASE WHEN ((k // {_R_SIDE}) * 4) * {_SIDE} + (k % {_R_SIDE}) * 4 + 1 <= n
                THEN p[((k // {_R_SIDE}) * 4) * {_SIDE} + (k % {_R_SIDE}) * 4 + 1]
                ELSE 0 END) AS q
  FROM px
)
SELECT doc_id,
       round(list_sum(q) / {_R_SIDE * _R_SIDE}.0, 6) AS mean_px,
       round(sqrt(
         list_sum(list_transform(q, x -> CAST(x AS DOUBLE) * x))
           / {_R_SIDE * _R_SIDE}.0
         - (list_sum(q) / {_R_SIDE * _R_SIDE}.0) ^ 2
       ), 6) AS std_px
FROM r
"""


@register(
    "multimodal_resize_stats", oracle=_RESIZE_ORACLE, tags=("llm", "multimodal")
)
def multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode → nearest-neighbor resize (32×32 → 8×8) → re-encode →
    decode → stats, all in Arrow-batched mapInPandas over the binary
    column. The oracle picks the identical stride-4 source pixels out
    of the document bytes, value-checking the full resize pipeline."""
    media = media_from_documents(spark, sf_dir)
    resized = ops.resize_images(media, _R_SIDE, _R_SIDE)
    stats = ops.decode_stats(resized)
    return stats.select(
        F.col("media_id").alias("doc_id"),
        F.round("mean_px", 6).alias("mean_px"),
        F.round("std_px", 6).alias("std_px"),
    )
