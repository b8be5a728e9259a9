"""Multimodal plumbing: typed binary columns through Arrow-batched
mapInPandas — deterministic toy codec, real Spark mechanics."""

from __future__ import annotations

import numpy as np
import pytest

from openmetrics_spark.multimodal import (
    audio_features,
    decode_stats,
    frame_sample,
    resize_images,
    synthetic_media,
)
from openmetrics_spark.multimodal import codecs


def test_codec_roundtrip():
    px = np.arange(24 * 32 * 3, dtype=np.uint8).reshape(24, 32, 3) % 251
    assert (codecs.decode_image(codecs.encode_image(px)) == px).all()
    with pytest.raises(NotImplementedError):
        codecs.decode_image(b"\x89PNG\r\n...")  # real formats are stubbed


def test_decode_stats_deterministic(spark):
    media = synthetic_media(spark, 20, "image")
    stats = {r.media_id: r for r in decode_stats(media).collect()}
    assert len(stats) == 20
    # regenerate one image locally; stats must match exactly
    rng = np.random.RandomState(5 + 3)
    w, h, c = 32 + 3 % 3 * 16, 24 + 3 % 2 * 8, 3
    px = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)
    assert stats[3].mean_px == pytest.approx(float(px.mean()))
    assert stats[3].width == w and stats[3].height == h


def test_resize_images(spark):
    media = synthetic_media(spark, 6, "image")
    resized = resize_images(media, 16, 16)
    for r in resized.collect():
        px = codecs.decode_image(bytes(r.data))
        assert px.shape == (16, 16, 3)


def test_audio_features(spark):
    media = synthetic_media(spark, 5, "audio")
    rows = audio_features(media).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.sample_rate == 16000
        assert r.rms > 0 and r.zero_crossings > 0


def test_frame_sample(spark):
    media = synthetic_media(spark, 8, "video")
    frames = frame_sample(media, every_n=2)
    got = frames.groupBy("media_id").count().collect()
    for r in got:
        nf = 8 + r.media_id % 5
        assert r["count"] == (nf + 1) // 2
    one = frames.filter("media_id = 0 and frame_index = 0").collect()[0]
    assert codecs.decode_image(bytes(one.frame)).shape == (12, 16)


def test_metadata_only_prunes_binary(spark, tmp_path):
    """A metadata-only query over the media table must not read the
    binary column (ReadSchema excludes `data`) — the property that
    makes metadata filters cheap on a 100 TB media lake."""
    media = synthetic_media(spark, 10, "image")
    path = str(tmp_path / "media")
    media.write.parquet(path)
    back = spark.read.parquet(path).select("media_id", "metadata.width")
    schema_line = (
        back._jdf.queryExecution().executedPlan().toString()
        .split("ReadSchema:")[1][:200]
    )
    assert "data:binary" not in schema_line
    # nested pruning: only metadata.width survives
    assert "metadata:struct<width:int>" in schema_line


def test_pil_real_codec_seam():
    """The real-format branch of decode_image: a PNG generated
    in-process round-trips through PIL to the original array.
    Skips (with reason) where PIL is not installed — this container
    does not bundle it; the RAW formats above keep the operator layer
    verified either way."""
    pytest.importorskip("PIL", reason="real image codecs need PIL")
    import io

    from PIL import Image

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    got = codecs.decode_image(buf.getvalue())
    assert got.shape == arr.shape
    assert (got == arr).all()


def test_real_codec_raises_without_pil():
    """Where PIL is absent the seam must stay an explicit
    NotImplementedError (never a silent wrong decode) for non-RAW
    bytes."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed; the raising branch is unreachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        codecs.decode_image(b"\x89PNG\r\n\x1a\nnotreally")
