"""Multimodal (image/audio/video) columns for training-data pipelines.

Media travels as opaque ``binary`` columns + typed metadata structs;
compute (decode, feature-extract, resize, frame-sample) runs in
Arrow-batched ``mapInPandas`` UDFs so a 100 TB corpus streams through
executors batch-by-batch — no driver collect, no per-row Python
overhead, and the binary column prunes away for metadata-only queries.

The real codecs (PIL/ffmpeg/librosa) are NOT part of this engine; the
decode seam (`multimodal.codecs`) ships with a deterministic toy RAW
codec so the Spark-side plumbing — schemas, batching, partitioning,
UDF signatures — is real and tested. Swapping in a real codec is a
one-function change per format.
"""

from openmetrics_spark.multimodal.ops import (
    MEDIA_SCHEMA,
    audio_features,
    decode_stats,
    frame_sample,
    resize_images,
    synthetic_media,
)

__all__ = [
    "MEDIA_SCHEMA",
    "audio_features",
    "decode_stats",
    "frame_sample",
    "resize_images",
    "synthetic_media",
]
