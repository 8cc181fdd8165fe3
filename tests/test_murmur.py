"""Murmur3 correctness: vectorized vs scalar vs known vectors."""

import numpy as np

from mhray.murmur import (
    murmur3_x64_128,
    murmur3_x64_128_scalar,
    murmur3_x86_32,
    murmur3_x86_32_scalar,
)


def test_x86_32_known_vectors():
    # canonical smhasher/guava test vectors
    assert murmur3_x86_32_scalar(b"") == 0
    assert murmur3_x86_32_scalar(b"hello", 0) == 0x248BFA47
    assert murmur3_x86_32_scalar(b"Hello, world!", 0x9747B28C) == 0x24884CBA


def test_x64_128_known_vectors():
    # h1 of murmur3_x64_128("hello", seed=0); cross-library constant
    assert murmur3_x64_128_scalar(b"") == 0
    assert murmur3_x64_128_scalar(b"hello") == 0xCBD8A7B341BD9B02


def test_vectorized_matches_scalar_128():
    rng = np.random.default_rng(7)
    for width in (8, 16, 24, 32, 33, 40, 7, 1):
        data = rng.integers(0, 256, size=(50, width), dtype=np.uint8)
        vec = murmur3_x64_128(data)
        for i in range(50):
            assert int(vec[i]) == murmur3_x64_128_scalar(data[i].tobytes()), width


def test_vectorized_matches_scalar_32():
    rng = np.random.default_rng(8)
    for width in (4, 8, 24, 26, 3, 1):
        data = rng.integers(0, 256, size=(50, width), dtype=np.uint8)
        vec = murmur3_x86_32(data)
        for i in range(50):
            assert int(vec[i]) == murmur3_x86_32_scalar(data[i].tobytes()), width


def test_seed_handling():
    data = np.arange(64, dtype=np.uint8).reshape(2, 32)
    a = murmur3_x64_128(data, seed=0)
    b = murmur3_x64_128(data, seed=42)
    assert not np.array_equal(a, b)
    assert int(b[0]) == murmur3_x64_128_scalar(data[0].tobytes(), seed=42)
