"""Audio / video byte codecs — pure numpy, no external media libs.

Same design contract as the image codecs (core/codec.py): the payload is
an opaque ``binary`` column with typed metadata; REAL codecs exist for
the self-describing raw formats (PCM16 audio, RAWV gray video) so the
decode/feature/frame-sample plumbing is genuinely exercised end-to-end,
while compressed formats (mp3/flac/h264) are documented stubs — the
sandbox has no media libraries (SURVEY.md §7 environment facts), and the
Spark-side plumbing (schema, batching, UDF signatures) is identical
whichever codec fills the bytes.

Layouts (little-endian):
- PCM16: b"PCM1" | uint32 sample_rate | int16 samples[]
- RAWV:  b"RAWV" | uint16 w | uint16 h | uint16 n_frames | uint8 fps
         | uint8 gray frames[n_frames * h * w]
"""

from __future__ import annotations

import struct

import numpy as np

_PCM_MAGIC = b"PCM1"
_RAWV_MAGIC = b"RAWV"


def pcm16_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    s = np.clip(np.asarray(samples), -32768, 32767).astype("<i2")
    return _PCM_MAGIC + struct.pack("<I", sample_rate) + s.tobytes()


def pcm16_decode(data: bytes) -> tuple[np.ndarray, int]:
    if data[:4] != _PCM_MAGIC:
        raise ValueError("not a PCM1 payload")
    (rate,) = struct.unpack("<I", data[4:8])
    return np.frombuffer(data[8:], dtype="<i2").astype(np.float64), rate


def rawv_encode(frames: np.ndarray, fps: int = 24) -> bytes:
    f = np.asarray(frames, dtype=np.uint8)
    n, h, w = f.shape
    return (
        _RAWV_MAGIC
        + struct.pack("<HHHB", w, h, n, fps)
        + f.tobytes()
    )


def rawv_decode(data: bytes) -> tuple[np.ndarray, int]:
    """-> (frames uint8 (n, h, w), fps)."""
    if data[:4] != _RAWV_MAGIC:
        raise ValueError("not a RAWV payload")
    w, h, n, fps = struct.unpack("<HHHB", data[4:11])
    f = np.frombuffer(data[11:11 + n * h * w], dtype=np.uint8)
    return f.reshape(n, h, w), fps


def decode_audio(data: bytes, codec: str) -> tuple[np.ndarray, int]:
    if codec == "pcm16":
        return pcm16_decode(bytes(data))
    # real-world path needs an audio library the sandbox doesn't ship;
    # the plumbing (schema, batching, features) is codec-agnostic
    raise NotImplementedError(f"audio codec {codec!r}: no decoder in sandbox")


def decode_video(data: bytes, codec: str) -> tuple[np.ndarray, int]:
    if codec == "rawv":
        return rawv_decode(bytes(data))
    raise NotImplementedError(f"video codec {codec!r}: no decoder in sandbox")
