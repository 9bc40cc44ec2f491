"""Image payload codecs — pure numpy, no external image libraries.

The sandbox has no PIL/opencv, so per SURVEY.md §7 the engine ships two
self-contained codecs that make the multimodal plumbing REAL (schema,
batching, verification) while staying deterministic:

- ``ppm`` — binary PPM (P6), lossless: the exact-pixel path.
- ``dct`` — a tiny 8x8 block-DCT codec with uniform quantization, lossy:
  exercises the PSNR >= 40 dB verification path of BASELINE.json.input_hint.

Plus ``psnr`` and a 64-bit perceptual hash ``phash64`` (8x8 block-mean DCT
sign hash) used for dedup/verification.  Any *other* ``fmt`` value decodes
via NotImplementedError — the documented stub for real-world codecs that
need external libraries (jpeg/png/webp).
"""

from __future__ import annotations

import numpy as np

_Q = 6.0  # DCT quantization step: keeps PSNR well above 40 dB for smooth blocks


# ---------------------------------------------------------------- PPM (P6)

def ppm_encode(pixels: np.ndarray) -> bytes:
    """uint8 HxWx3 array -> binary PPM bytes."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def ppm_decode(data: bytes) -> np.ndarray:
    """Binary PPM bytes -> uint8 HxWx3 array."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    parts = data.split(b"\n", 3)
    w, h = (int(x) for x in parts[1].split())
    maxval = int(parts[2])
    assert maxval == 255
    return np.frombuffer(parts[3], dtype=np.uint8, count=h * w * 3).reshape(h, w, 3)


# ------------------------------------------------------------- DCT (lossy)

def _dct_mat(n: int = 8) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0] = np.sqrt(1.0 / n)
    return m


_DCT8 = _dct_mat(8)


def _blockify(img: np.ndarray) -> tuple[np.ndarray, int, int]:
    h, w = img.shape
    ph, pw = (-h) % 8, (-w) % 8
    img = np.pad(img, ((0, ph), (0, pw)), mode="edge")
    H, W = img.shape
    blocks = img.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
    return blocks, h, w


def dct_encode(pixels: np.ndarray) -> bytes:
    """uint8 HxWx3 -> quantized block-DCT bytes (int16 coefficients)."""
    h, w, _ = pixels.shape
    planes = []
    for ch in range(3):
        blocks, _, _ = _blockify(pixels[:, :, ch].astype(np.float64) - 128.0)
        coef = _DCT8 @ blocks @ _DCT8.T
        planes.append(np.round(coef / _Q).astype(np.int16))
    head = b"DCT1" + np.array([h, w], dtype=np.int32).tobytes()
    return head + np.stack(planes).tobytes()


def dct_decode(data: bytes) -> np.ndarray:
    if not data.startswith(b"DCT1"):
        raise ValueError("not a DCT1 payload")
    h, w = np.frombuffer(data, dtype=np.int32, count=2, offset=4)
    H, W = h + ((-h) % 8), w + ((-w) % 8)
    nb = (H // 8) * (W // 8) * 64
    out = np.empty((h, w, 3), dtype=np.uint8)
    for ch in range(3):
        coef = np.frombuffer(
            data, dtype=np.int16, count=nb, offset=12 + ch * nb * 2
        ).astype(np.float64).reshape(H // 8, W // 8, 8, 8) * _Q
        blocks = _DCT8.T @ coef @ _DCT8
        plane = blocks.transpose(0, 2, 1, 3).reshape(H, W)[:h, :w] + 128.0
        out[:, :, ch] = np.clip(np.round(plane), 0, 255).astype(np.uint8)
    return out


# ------------------------------------------------------------ dispatch API

def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "ppm":
        return ppm_encode(pixels)
    if fmt == "dct":
        return dct_encode(pixels)
    raise NotImplementedError(
        f"codec {fmt!r} requires an external image library (not in sandbox)"
    )


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "ppm":
        return ppm_decode(data)
    if fmt == "dct":
        return dct_decode(data)
    raise NotImplementedError(
        f"codec {fmt!r} requires an external image library (not in sandbox)"
    )


# --------------------------------------------------------------- verify ops

def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0.0:
        return float("inf")
    return float(10.0 * np.log10(255.0 ** 2 / mse))


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash: grayscale -> 32x32 block-mean resize -> 8x8
    low-frequency DCT -> sign-vs-median bits.  Deterministic, pure numpy."""
    g = pixels.astype(np.float64).mean(axis=2)
    h, w = g.shape
    # block-mean resize to 32x32 via index mapping (handles any h, w)
    yi = (np.arange(32) * h) // 32
    xi = (np.arange(32) * w) // 32
    small = g[np.ix_(yi, xi)]
    m = _dct_mat(32)
    coef = (m @ small @ m.T)[:8, :8].ravel()
    med = np.median(coef[1:])  # skip DC
    bits = (coef > med).astype(np.uint64)
    val = np.uint64(0)
    for b in bits:
        val = (val << np.uint64(1)) | b
    return int(val.astype(np.int64))  # as signed int64 for the phash column
