"""Codec + payload verification invariants (FIXTURES.md §2.8)."""

import numpy as np
import pytest

from ionex_spark.core.codec import (
    decode_image,
    dct_decode,
    dct_encode,
    encode_image,
    phash64,
    ppm_decode,
    ppm_encode,
    psnr,
)
from ionex_spark.core.synth import image_pixels, image_row


def test_ppm_lossless_roundtrip():
    img = image_pixels(7, 32, 16)
    np.testing.assert_array_equal(ppm_decode(ppm_encode(img)), img)


def test_dct_lossy_psnr_above_40():
    for i in (0, 3, 11):
        img = image_pixels(i, 64, 32)
        rec = dct_decode(dct_encode(img))
        assert rec.shape == img.shape
        assert psnr(img, rec) >= 40.0


def test_dct_nonmultiple_of_8():
    img = image_pixels(5, 20, 13)  # requires edge padding
    rec = dct_decode(dct_encode(img))
    assert rec.shape == img.shape
    assert psnr(img, rec) >= 40.0


def test_psnr_identity_inf():
    img = image_pixels(1, 16, 16)
    assert psnr(img, img) == float("inf")


def test_unknown_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8", "jpeg")
    with pytest.raises(NotImplementedError):
        encode_image(np.zeros((8, 8, 3), np.uint8), "png")


def test_phash_deterministic_and_discriminative():
    a = phash64(image_pixels(1, 32, 32))
    a2 = phash64(image_pixels(1, 32, 32))
    b = phash64(image_pixels(2, 32, 32))
    assert a == a2
    assert a != b
    assert np.int64(a) is not None  # fits signed int64


def test_phash_robust_to_lossy_codec():
    img = image_pixels(9, 64, 64)
    rec = dct_decode(dct_encode(img))
    d = bin(int(np.uint64(np.int64(phash64(img)) ^ np.int64(phash64(rec))))).count("1")
    assert d <= 10  # near-duplicate under the usual phash hamming threshold


def test_image_row_contract():
    r = image_row(123)
    assert r["image_id"] == "img000000000123"
    assert r["fmt"] in ("ppm", "dct")
    dec = decode_image(r["bytes"], r["fmt"])
    assert dec.shape == (r["h"], r["w"], 3)
    src = image_pixels(123, int(r["w"]), int(r["h"]))
    if r["fmt"] == "ppm":
        np.testing.assert_array_equal(dec, src)
    else:
        assert psnr(src, dec) >= 40.0
    assert -87.5 <= r["lat"] <= 87.5
    assert -180.0 <= r["lon"] <= 180.0
