"""The decode seam between opaque media bytes and numpy arrays.

Real formats (JPEG/PNG/WAV/MP4) need codec libraries that are not
bundled; their entries raise NotImplementedError with the intended
implementation noted. The deterministic RAW toy format keeps every
downstream operator testable:

    image:  b"RAWI" + uint16 width + uint16 height + uint8 channels
            + row-major uint8 pixels
    audio:  b"RAWA" + uint32 sample_rate + int16 PCM samples
    video:  b"RAWV" + uint16 width + uint16 height + uint16 n_frames
            + per-frame grayscale uint8 pixels
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC_IMAGE = b"RAWI"
MAGIC_AUDIO = b"RAWA"
MAGIC_VIDEO = b"RAWV"


def encode_image(pixels: np.ndarray) -> bytes:
    h, w = pixels.shape[:2]
    c = 1 if pixels.ndim == 2 else pixels.shape[2]
    return MAGIC_IMAGE + struct.pack("<HHB", w, h, c) + pixels.astype(np.uint8).tobytes()


def decode_image(data: bytes) -> np.ndarray:
    if data[:4] == MAGIC_IMAGE:
        w, h, c = struct.unpack("<HHB", data[4:9])
        arr = np.frombuffer(data[9:], dtype=np.uint8)
        return arr.reshape((h, w, c)) if c > 1 else arr.reshape((h, w))
    # real-format seam: PIL decodes JPEG/PNG/… wherever it is
    # installed (tests/test_multimodal.py exercises it behind
    # importorskip); this container does not bundle it
    try:
        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as e:
        raise NotImplementedError(
            "real image codecs (JPEG/PNG) need PIL, which is not "
            "bundled; only the RAWI toy format decodes without it"
        ) from e
    import io

    return np.asarray(Image.open(io.BytesIO(data)))


def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    return MAGIC_AUDIO + struct.pack("<I", sample_rate) + samples.astype("<i2").tobytes()


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    if data[:4] != MAGIC_AUDIO:
        raise NotImplementedError(
            "real audio codecs (WAV/MP3 via soundfile/librosa) are not "
            "bundled; only the RAWA toy format decodes here"
        )
    (rate,) = struct.unpack("<I", data[4:8])
    return np.frombuffer(data[8:], dtype="<i2"), rate


def encode_video(frames: np.ndarray) -> bytes:
    n, h, w = frames.shape
    return MAGIC_VIDEO + struct.pack("<HHH", w, h, n) + frames.astype(np.uint8).tobytes()


def decode_video(data: bytes) -> np.ndarray:
    if data[:4] != MAGIC_VIDEO:
        raise NotImplementedError(
            "real video demuxers (ffmpeg) are not bundled; only the "
            "RAWV toy format decodes here"
        )
    w, h, n = struct.unpack("<HHH", data[4:10])
    return np.frombuffer(data[10:], dtype=np.uint8).reshape((n, h, w))
