"""Per-chunk bloom filters over token values (numpy-vectorized).

Parity with the reference's bloom directives (`set column C bloom_filter
true|_ndv N|_fpp P`, prescription.rs:113-130) and its keep-bloom-iff-present
inference (fix.rs:168-182). The engine's use case: "which chunks contain
token X" — membership pruning for value scans over the encoded table, the
split-block-bloom role Parquet gives its column chunks.

Standard sizing: m = ceil(-n ln p / ln²2) bits, k = max(1, round(m/n · ln 2)).
Double hashing (Kirsch-Mitzenmacher): index_i = (h1 + i·h2) mod m with two
splitmix64-derived hashes — all set/test operations are vectorized over the
value array; the only loops are over k (≤ ~10) probe offsets.

Wire: b"BF" | k u8 | m u64 | bitset bytes (m/8 rounded up).
"""

from __future__ import annotations

import math
import struct

import numpy as np

_HDR = struct.Struct("<2sBQ")
MAX_BITS = 1 << 24  # 2 MB cap per chunk filter

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def _splitmix(x: np.ndarray) -> np.ndarray:
    z = x + _C1
    z = (z ^ (z >> np.uint64(30))) * _C2
    z = (z ^ (z >> np.uint64(27))) * _C3
    return z ^ (z >> np.uint64(31))


def _hashes(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    v = values.astype(np.int64).view(np.uint64)
    h1 = _splitmix(v)
    h2 = _splitmix(h1) | np.uint64(1)  # odd → full-period double hashing
    return h1, h2


def build_bloom(values: np.ndarray, fpp: float = 0.01, ndv: int | None = None) -> bytes:
    """Bloom filter over the distinct values of an int32 array."""
    distinct = np.unique(values)
    n = ndv if ndv is not None else max(len(distinct), 1)
    m = int(math.ceil(-n * math.log(max(fpp, 1e-9)) / (math.log(2) ** 2)))
    m = max(64, min(m, MAX_BITS))
    k = max(1, round(m / n * math.log(2)))
    k = min(k, 16)
    bits = np.zeros((m + 7) // 8, dtype=np.uint8)
    h1, h2 = _hashes(distinct)
    mm = np.uint64(m)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % mm
        np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64), (1 << (pos & np.uint64(7))).astype(np.uint8))
    return _HDR.pack(b"BF", k, m) + bits.tobytes()


def might_contain(bloom: bytes, value: int) -> bool:
    """Probe one value against a serialized filter. The k probe offsets are
    computed vectorized in uint64 (mod-2^64 wraparound matches the build
    path); scalar h1+i*h2 arithmetic would emit an overflow RuntimeWarning
    per probe — noisy at one-probe-per-chunk-row scale. int64-safe: the
    build path widens every input to int64 before hashing, so int32 and
    string-hash (int64) values probe identically."""
    magic, k, m = _HDR.unpack_from(bloom, 0)
    if magic != b"BF":
        raise ValueError("bad bloom header")
    bits = np.frombuffer(bloom, dtype=np.uint8, offset=_HDR.size)
    h1, h2 = _hashes(np.array([value], dtype=np.int64))
    pos = (h1 + np.arange(k, dtype=np.uint64) * h2) % np.uint64(m)
    return bool(np.all((bits[(pos >> np.uint64(3)).astype(np.int64)] >> (pos & np.uint64(7)).astype(np.uint8)) & 1))


def might_contain_any(bloom: bytes, values: np.ndarray) -> bool:
    """True iff the filter admits AT LEAST ONE of `values` (the lookup()
    pruning predicate: a chunk survives if any requested id might be in
    it). One vectorized pass over all values × k probes."""
    magic, k, m = _HDR.unpack_from(bloom, 0)
    if magic != b"BF":
        raise ValueError("bad bloom header")
    bits = np.frombuffer(bloom, dtype=np.uint8, offset=_HDR.size)
    h1, h2 = _hashes(np.asarray(values, dtype=np.int64))
    hit = np.ones(len(h1), dtype=bool)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
        hit &= (bits[(pos >> np.uint64(3)).astype(np.int64)] >> (pos & np.uint64(7)).astype(np.uint8)) & 1 > 0
        if not hit.any():
            return False
    return True


def might_contain_many(blooms: "list[bytes] | np.ndarray", value: int) -> np.ndarray:
    """Probe one value against many chunk filters → bool per filter."""
    return np.array([might_contain(b, value) for b in blooms], dtype=bool)


# string values hash to int64 before entering the filter — FNV-1a 64,
# vectorized one character position per pass (≤ HASH_PREFIX bytes; longer
# strings share a hash on their prefix, which can only add false positives,
# never false negatives, as long as build and probe use the same cap)
FNV_OFFSET = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)
HASH_PREFIX = 64


def hash_strings(arr) -> np.ndarray:
    """FNV-1a 64-bit hashes of a null-free arrow string/binary array →
    int64 array (the bloom build/probe domain for string columns)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not (pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)):
        arr = arr.cast(
            pa.large_binary()
            if pa.types.is_binary(arr.type) or pa.types.is_fixed_size_binary(arr.type)
            else pa.large_string()
        )
    n = len(arr)
    if n == 0:
        return np.empty(0, np.int64)
    from .strcodecs import _offsets_data  # one buffer-extraction helper

    offsets, data = _offsets_data(arr)
    lens = np.minimum(np.diff(offsets), HASH_PREFIX)
    h = np.full(n, FNV_OFFSET, np.uint64)
    starts = offsets[:-1]
    for k in range(int(lens.max()) if n else 0):
        alive = lens > k
        h[alive] = (h[alive] ^ data[starts[alive] + k]) * FNV_PRIME
    return h.view(np.int64)


def hash_string(s: str | bytes) -> int:
    """Scalar twin of hash_strings (probe side)."""
    b = s.encode() if isinstance(s, str) else bytes(s)
    h = int(FNV_OFFSET)
    for c in b[:HASH_PREFIX]:
        h = ((h ^ c) * int(FNV_PRIME)) & 0xFFFFFFFFFFFFFFFF
    return h - (1 << 64) if h >= 1 << 63 else h
