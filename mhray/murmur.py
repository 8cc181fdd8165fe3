"""Vectorized MurmurHash3 over fixed-width byte windows.

The reference hashes every k-shingle with Guava's murmur3_128 /
murmur3_32 applied to the UTF-16LE bytes of the shingle
(``putUnencodedChars``; sketch/HashUtils.java:237-258 and :213-235).
Shingles of a fixed character count k are fixed-width byte strings
(2k bytes), which lets us evaluate the whole hash family as numpy
ops over an (N, width) uint8 matrix — one vector op per block step
instead of a Python loop per shingle.

Scalar reference implementations (``murmur3_x64_128_scalar``,
``murmur3_x86_32_scalar``) are kept for unit cross-checks.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)

_C1_128 = np.uint64(0x87C37B91114253D5)
_C2_128 = np.uint64(0x4CF5AD432745937F)

_C1_32 = np.uint32(0xCC9E2D51)
_C2_32 = np.uint32(0x1B873593)


def _rotl64(x: np.ndarray, r: int) -> np.ndarray:
    r_ = np.uint64(r)
    inv = np.uint64(64 - r)
    return (x << r_) | (x >> inv)


def _rotl32(x: np.ndarray, r: int) -> np.ndarray:
    r_ = np.uint32(r)
    inv = np.uint32(32 - r)
    return (x << r_) | (x >> inv)


def _fmix64(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xC4CEB9FE1A85EC53)
    k = k ^ (k >> np.uint64(33))
    return k


def _fmix32(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint32(16))
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> np.uint32(13))
    h = h * np.uint32(0xC2B2AE35)
    h = h ^ (h >> np.uint32(16))
    return h


def murmur3_x64_128(data: np.ndarray, seed: int = 0) -> np.ndarray:
    """murmur3 x64 128-bit over N fixed-width byte rows; returns h1 as uint64.

    ``data``: (N, width) uint8 array (C-contiguous). Returns shape (N,)
    uint64 — the low 64 bits of the 128-bit hash, matching Guava's
    ``HashCode.asLong()`` (first 8 output bytes little-endian = h1).
    """
    if data.ndim != 2 or data.dtype != np.uint8:
        raise ValueError("data must be (N, width) uint8")
    n, width = data.shape
    h1 = np.full(n, seed, dtype=_U64)
    h2 = np.full(n, seed, dtype=_U64)

    nblocks = width // 16
    if nblocks:
        # view the leading 16*nblocks bytes as little-endian uint64 pairs
        body = data[:, : nblocks * 16]
        if not body.flags.c_contiguous:
            body = np.ascontiguousarray(body)
        words = body.view("<u8").reshape(n, nblocks * 2).astype(_U64, copy=False)
        for b in range(nblocks):
            k1 = words[:, 2 * b].copy()
            k2 = words[:, 2 * b + 1].copy()

            k1 *= _C1_128
            k1 = _rotl64(k1, 31)
            k1 *= _C2_128
            h1 ^= k1
            h1 = _rotl64(h1, 27)
            h1 += h2
            h1 = h1 * np.uint64(5) + np.uint64(0x52DCE729)

            k2 *= _C2_128
            k2 = _rotl64(k2, 33)
            k2 *= _C1_128
            h2 ^= k2
            h2 = _rotl64(h2, 31)
            h2 += h1
            h2 = h2 * np.uint64(5) + np.uint64(0x38495AB5)

    tail_len = width & 15
    if tail_len:
        tail = data[:, nblocks * 16 :]
        k1 = np.zeros(n, dtype=_U64)
        k2 = np.zeros(n, dtype=_U64)
        for i in range(min(tail_len, 8)):
            k1 ^= tail[:, i].astype(_U64) << np.uint64(8 * i)
        for i in range(8, tail_len):
            k2 ^= tail[:, i].astype(_U64) << np.uint64(8 * (i - 8))
        k2 *= _C2_128
        k2 = _rotl64(k2, 33)
        k2 *= _C1_128
        h2 ^= k2
        k1 *= _C1_128
        k1 = _rotl64(k1, 31)
        k1 *= _C2_128
        h1 ^= k1

    wlen = np.uint64(width)
    h1 ^= wlen
    h2 ^= wlen
    h1 += h2
    h2 += h1
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 += h2
    # h2 += h1  # not needed: we only return h1
    return h1


def murmur3_x64_128_ragged(data: np.ndarray, byte_offsets: np.ndarray,
                           seed: int = 0) -> np.ndarray:
    """murmur3 x64 128-bit (h1) over N VARIABLE-width byte rows.

    ``data`` is the concatenated byte stream; row i is
    ``data[byte_offsets[i]:byte_offsets[i+1]]``. Iterates over the
    16-byte BLOCK INDEX — every iteration advances all still-active
    rows with vector ops — instead of hashing one exact-length group
    per call (hundreds of tiny murmur invocations whose numpy call
    overhead dominates when lengths are diverse). Bit-identical to
    ``murmur3_x64_128`` row-by-row.
    """
    byte_offsets = np.asarray(byte_offsets, dtype=np.int64)
    n = len(byte_offsets) - 1
    widths = np.diff(byte_offsets)
    h1 = np.full(n, seed, dtype=_U64)
    h2 = np.full(n, seed, dtype=_U64)
    nblocks = widths // 16
    starts = byte_offsets[:-1]

    max_b = int(nblocks.max()) if n else 0
    for b in range(max_b):
        act = np.flatnonzero(nblocks > b)
        blk = data[(starts[act] + 16 * b)[:, None] + np.arange(16)]
        words = blk.view("<u8")
        k1 = words[:, 0].astype(_U64, copy=True)
        k2 = words[:, 1].astype(_U64, copy=True)
        a1 = h1[act]
        a2 = h2[act]

        k1 *= _C1_128
        k1 = _rotl64(k1, 31)
        k1 *= _C2_128
        a1 ^= k1
        a1 = _rotl64(a1, 27)
        a1 += a2
        a1 = a1 * np.uint64(5) + np.uint64(0x52DCE729)

        k2 *= _C2_128
        k2 = _rotl64(k2, 33)
        k2 *= _C1_128
        a2 ^= k2
        a2 = _rotl64(a2, 31)
        a2 += a1
        a2 = a2 * np.uint64(5) + np.uint64(0x38495AB5)
        h1[act] = a1
        h2[act] = a2

    tails = widths & 15
    for tl in np.unique(tails):
        tl = int(tl)
        if tl == 0:
            continue
        act = np.flatnonzero(tails == tl)
        base = starts[act] + 16 * nblocks[act]
        k1 = np.zeros(len(act), dtype=_U64)
        k2 = np.zeros(len(act), dtype=_U64)
        for i in range(min(tl, 8)):
            k1 ^= data[base + i].astype(_U64) << np.uint64(8 * i)
        for i in range(8, tl):
            k2 ^= data[base + i].astype(_U64) << np.uint64(8 * (i - 8))
        k2 *= _C2_128
        k2 = _rotl64(k2, 33)
        k2 *= _C1_128
        h2[act] ^= k2
        k1 *= _C1_128
        k1 = _rotl64(k1, 31)
        k1 *= _C2_128
        h1[act] ^= k1

    wlen = widths.view(np.uint64) if widths.dtype == np.int64 \
        else widths.astype(_U64)
    h1 ^= wlen
    h2 ^= wlen
    h1 += h2
    h2 += h1
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 += h2
    # h2 += h1  # not needed: we only return h1
    return h1


def murmur3_x86_32(data: np.ndarray, seed: int = 0) -> np.ndarray:
    """murmur3 x86 32-bit over N fixed-width byte rows; returns int32.

    Matches Guava murmur3_32(seed).putUnencodedChars(...).asInt() when
    ``data`` holds UTF-16LE bytes.
    """
    if data.ndim != 2 or data.dtype != np.uint8:
        raise ValueError("data must be (N, width) uint8")
    n, width = data.shape
    h = np.full(n, seed, dtype=np.uint32)

    nblocks = width // 4
    if nblocks:
        body = data[:, : nblocks * 4]
        if not body.flags.c_contiguous:
            body = np.ascontiguousarray(body)
        words = body.view("<u4").reshape(n, nblocks)
        for b in range(nblocks):
            k = words[:, b].astype(np.uint32, copy=True)
            k *= _C1_32
            k = _rotl32(k, 15)
            k *= _C2_32
            h ^= k
            h = _rotl32(h, 13)
            h = h * np.uint32(5) + np.uint32(0xE6546B64)

    tail_len = width & 3
    if tail_len:
        tail = data[:, nblocks * 4 :]
        k = np.zeros(n, dtype=np.uint32)
        for i in range(tail_len):
            k ^= tail[:, i].astype(np.uint32) << np.uint32(8 * i)
        k *= _C1_32
        k = _rotl32(k, 15)
        k *= _C2_32
        h ^= k

    h ^= np.uint32(width)
    h = _fmix32(h)
    return h.view(np.int32)


# ---------------------------------------------------------------------------
# scalar reference implementations (tests only)
# ---------------------------------------------------------------------------

def murmur3_x64_128_scalar(data: bytes, seed: int = 0) -> int:
    """Pure-python murmur3 x64_128; returns h1 as unsigned 64-bit int."""
    m = (1 << 64) - 1

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & m

    def fmix(k):
        k ^= k >> 33
        k = (k * 0xFF51AFD7ED558CCD) & m
        k ^= k >> 33
        k = (k * 0xC4CEB9FE1A85EC53) & m
        k ^= k >> 33
        return k

    h1 = h2 = seed & m
    length = len(data)
    nblocks = length // 16
    for b in range(nblocks):
        k1 = int.from_bytes(data[16 * b : 16 * b + 8], "little")
        k2 = int.from_bytes(data[16 * b + 8 : 16 * b + 16], "little")
        k1 = (k1 * 0x87C37B91114253D5) & m
        k1 = rotl(k1, 31)
        k1 = (k1 * 0x4CF5AD432745937F) & m
        h1 ^= k1
        h1 = rotl(h1, 27)
        h1 = (h1 + h2) & m
        h1 = (h1 * 5 + 0x52DCE729) & m
        k2 = (k2 * 0x4CF5AD432745937F) & m
        k2 = rotl(k2, 33)
        k2 = (k2 * 0x87C37B91114253D5) & m
        h2 ^= k2
        h2 = rotl(h2, 31)
        h2 = (h2 + h1) & m
        h2 = (h2 * 5 + 0x38495AB5) & m

    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    for i in range(min(len(tail), 8)):
        k1 ^= tail[i] << (8 * i)
    for i in range(8, len(tail)):
        k2 ^= tail[i] << (8 * (i - 8))
    if tail:
        k2 = (k2 * 0x4CF5AD432745937F) & m
        k2 = rotl(k2, 33)
        k2 = (k2 * 0x87C37B91114253D5) & m
        h2 ^= k2
        k1 = (k1 * 0x87C37B91114253D5) & m
        k1 = rotl(k1, 31)
        k1 = (k1 * 0x4CF5AD432745937F) & m
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & m
    h2 = (h2 + h1) & m
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = (h1 + h2) & m
    return h1


def murmur3_x86_32_scalar(data: bytes, seed: int = 0) -> int:
    """Pure-python murmur3 x86_32; returns signed int32."""
    m = (1 << 32) - 1

    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & m

    h = seed & m
    length = len(data)
    nblocks = length // 4
    for b in range(nblocks):
        k = int.from_bytes(data[4 * b : 4 * b + 4], "little")
        k = (k * 0xCC9E2D51) & m
        k = rotl(k, 15)
        k = (k * 0x1B873593) & m
        h ^= k
        h = rotl(h, 13)
        h = (h * 5 + 0xE6546B64) & m
    tail = data[nblocks * 4 :]
    k = 0
    for i in range(len(tail)):
        k ^= tail[i] << (8 * i)
    if tail:
        k = (k * 0xCC9E2D51) & m
        k = rotl(k, 15)
        k = (k * 0x1B873593) & m
        h ^= k
    h ^= length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & m
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & m
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h
