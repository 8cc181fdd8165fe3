"""Codec roundtrips, pHash stability, PSNR invariant."""

import numpy as np
import pytest

from mhray import imageops as I


def _img(seed=0, n=32):
    from mhray.synth import _base_image

    return _base_image(np.random.default_rng(seed), n)


def test_ppm_roundtrip():
    img = _img(1)
    data = I.encode_ppm(img)
    np.testing.assert_array_equal(I.decode_ppm(data), img)


def test_png_roundtrip():
    img = _img(2)
    data = I.encode_png(img)
    np.testing.assert_array_equal(I.decode_png(data), img)


def test_decode_dispatch_and_stub():
    img = _img(3)
    np.testing.assert_array_equal(I.decode_image(I.encode_png(img), "png"), img)
    with pytest.raises(NotImplementedError):
        I.decode_image(b"\xff\xd8\xff", "jpeg")


def test_phash_stable_under_noise():
    img = _img(4)
    rng = np.random.default_rng(5)
    noisy = np.clip(img.astype(np.int16) + rng.integers(-2, 3, img.shape), 0, 255).astype(np.uint8)
    a = np.array([I.phash64(img)], dtype=np.int64)
    b = np.array([I.phash64(noisy)], dtype=np.int64)
    from mhray.kernels import hamming64

    assert hamming64(a, b)[0] <= 6


def test_phash_differs_across_images():
    from mhray.kernels import hamming64

    a = np.array([I.phash64(_img(6))], dtype=np.int64)
    b = np.array([I.phash64(_img(7))], dtype=np.int64)
    assert hamming64(a, b)[0] > 10


def test_psnr():
    img = _img(8)
    assert I.psnr(img, img) == float("inf")
    noisy = np.clip(img.astype(np.int16) + 2, 0, 255).astype(np.uint8)
    assert I.psnr(img, noisy) >= 40.0
    assert I.psnr(img, _img(9)) < 40.0


def test_psnr_shape_mismatch():
    assert I.psnr(_img(1, 32), _img(1, 16)) == 0.0
