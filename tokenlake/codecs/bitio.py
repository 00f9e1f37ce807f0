"""Vectorized bit-packing primitives (numpy only, no per-value Python).

Analog of Parquet's bit-packed encodings the reference recommends via
DELTA_BINARY_PACKED / BYTE_STREAM_SPLIT rules
(reference: src/parquet-linter/src/rules/timestamp_encoding.rs:8-91,
src/parquet-linter/src/rules/float_encoding.rs:17-90). The reference never
implements packing itself (it delegates to arrow-rs writers); we implement it
here because the engine IS the encoder.

Wire layout for width w (k = w//8 byte planes, r = w%8 bit planes):
- k byte planes, LSB first, n bytes each: plane b = byte b of each value
- r bit planes, each ceil(n/8) bytes: plane j = np.packbits of bit 8k+j
This is the BYTE_STREAM_SPLIT idea (float_encoding.rs) applied to packed
integers: every plane is produced/consumed by one contiguous vectorized pass
(a strided byte copy or a shift+packbits), so throughput is memory-bound
instead of the O(64 bits/value) matrix expansion a naive row-major bitstream
costs with numpy.
"""

from __future__ import annotations

import numpy as np

_CAST_DTYPES = {8: np.uint8, 16: np.uint16, 32: np.uint32, 64: np.uint64}


def width_for(max_value: int) -> int:
    """Bit width needed for unsigned values in [0, max_value]."""
    return int(max_value).bit_length()


def packed_nbytes(n: int, width: int) -> int:
    """Exact byte length of pack_uints(n values, width)."""
    if width == 0 or n == 0:
        return 0
    k, r = divmod(width, 8)
    return n * k + r * ((n + 7) // 8)


def _carrier(width: int) -> np.dtype:
    """Smallest unsigned dtype that holds `width` bits."""
    for bits, dt in ((8, np.uint8), (16, np.uint16), (32, np.uint32), (64, np.uint64)):
        if width <= bits:
            return np.dtype(dt)
    raise ValueError(f"width out of range: {width}")


def pack_uints(vals: np.ndarray, width: int) -> bytes:
    """Pack unsigned integers (< 2**width) into the plane layout.

    Values may arrive in any integer dtype; a direct cast to the carrier dtype
    truncates to the low bits, which is exact for non-negative values < 2**width
    (the caller's contract) and avoids widening everything to 8 B/value first —
    these kernels are memory-bound, so intermediate bytes are the cost model.
    """
    if width < 0 or width > 64:
        raise ValueError(f"width out of range: {width}")
    n = len(vals)
    if width == 0 or n == 0:
        return b""
    if width in _CAST_DTYPES:  # byte-aligned fast path: a cast IS the packing
        return np.ascontiguousarray(vals).astype(_CAST_DTYPES[width], copy=False).tobytes()
    dt = _carrier(width)
    v = np.ascontiguousarray(vals).astype(dt, copy=False)
    k, r = divmod(width, 8)
    # plane b = (v >> 8b) truncated to a byte: two sequential passes beat the
    # cache-hostile strided column copy out of an (n, itemsize) byte matrix
    parts = [(v >> np.uint8(8 * b)).astype(np.uint8).tobytes() for b in range(k)]
    if r:
        top = (v >> np.uint8(8 * k)).astype(np.uint8)
        for j in range(r):
            parts.append(np.packbits((top >> j) & 1, bitorder="little").tobytes())
    return b"".join(parts)


def unpack_uints(buf, n: int, width: int, dtype=np.uint64) -> np.ndarray:
    """Inverse of :func:`pack_uints`; returns an array of `dtype` (must be an
    unsigned type at least `width` bits wide) of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=dtype)
    if width in _CAST_DTYPES:
        return np.frombuffer(buf, dtype=_CAST_DTYPES[width], count=n).astype(dtype, copy=False)
    raw = np.frombuffer(buf, dtype=np.uint8)
    dt = _carrier(width)
    k, r = divmod(width, 8)
    out = np.zeros(n, dtype=dt)
    pos = 0
    for b in range(k):
        # sequential widen+shift+or per plane — no byte-matrix scatter
        out |= raw[pos : pos + n].astype(dt) << np.uint8(8 * b)
        pos += n
    if r:
        nbb = (n + 7) // 8
        top = np.zeros(n, dtype=np.uint8)
        for j in range(r):
            bits = np.unpackbits(raw[pos : pos + nbb], bitorder="little", count=n)
            top |= bits << j
            pos += nbb
        out |= top.astype(dt) << np.uint8(8 * k)
    return out.astype(dtype, copy=False)


def sorted_factorize(arr: np.ndarray, minmax: tuple[int, int] | None = None):
    """(sorted_unique_values, codes) — output identical to np.unique with
    return_inverse on large low-cardinality data, picked by value range:

    - dense path: when max-min fits a cache-resident table (token vocabs are
      tens of thousands of ids over millions of values), a presence-scatter +
      rank-LUT gather replaces the hash pass entirely — two linear sweeps of
      pure vectorized indexing, no per-value hashing, and the codes come out
      already in sorted-rank order (no second gather).
    - hash path (pd.factorize) otherwise, ~20× faster than np.unique with
      return_inverse; a rank permutation re-sorts its first-seen codes.

    Codes come back in the smallest unsigned dtype that fits the value count:
    the big gather (one element per input value) then moves 1-4 bytes per
    value instead of 8 — these kernels are memory-bound, so the code
    stream's width IS the cost."""
    n = len(arr)
    if n and arr.dtype.kind in "iu":
        # callers that already scanned the stream (the stats pass) hand the
        # bounds in — skips two redundant full passes per chunk
        mn, mx = minmax if minmax is not None else (int(arr.min()), int(arr.max()))
        rng = mx - mn + 1
        if rng <= min(max(4 * n, 1 << 16), 1 << 22):
            # subtract in a WIDE dtype: int16/int8 inputs whose span exceeds
            # their positive range would wrap and scatter into wrong slots
            if mn == 0:
                shifted = arr
            elif arr.dtype.itemsize < 8 and rng > np.iinfo(arr.dtype).max:
                shifted = arr.astype(np.int64) - mn
            else:
                shifted = arr - arr.dtype.type(mn)
            present = np.zeros(rng, dtype=bool)
            present[shifted] = True
            vals_off = np.flatnonzero(present)
            nv = len(vals_off)
            small = (
                np.uint8 if nv <= 1 << 8 else np.uint16 if nv <= 1 << 16 else np.uint32
            )
            lut = np.empty(rng, dtype=small)
            lut[vals_off] = np.arange(nv, dtype=small)
            return (vals_off + mn).astype(arr.dtype, copy=False), lut[shifted]
    import pandas as pd

    codes, vals = pd.factorize(arr)
    order = np.argsort(vals, kind="stable")
    nv = len(order)
    small = np.uint8 if nv <= 1 << 8 else np.uint16 if nv <= 1 << 16 else np.uint32
    rank = np.empty(nv, dtype=small)
    rank[order] = np.arange(nv, dtype=small)
    return np.asarray(vals)[order], rank[codes]


def ragged_arange(lens: np.ndarray) -> np.ndarray:
    """[0..lens[0]-1, 0..lens[1]-1, ...] vectorized (zero-length runs fine)."""
    lens = np.asarray(lens, dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.repeat(np.cumsum(np.r_[0, lens[:-1]]), lens)
    return np.arange(total, dtype=np.int64) - starts


def zigzag_encode(vals: np.ndarray) -> np.ndarray:
    """Map signed int64 → uint64 so small-magnitude values get small codes."""
    v = vals.astype(np.int64, copy=False)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def zigzag_decode(vals: np.ndarray) -> np.ndarray:
    v = vals.astype(np.uint64, copy=False)
    return ((v >> np.uint64(1)).astype(np.int64)) ^ -(v & np.uint64(1)).astype(np.int64)
