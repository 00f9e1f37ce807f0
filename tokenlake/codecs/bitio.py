"""Vectorized bit-packing primitives (numpy only, no per-value Python).

Analog of Parquet's bit-packed encodings the reference recommends via
DELTA_BINARY_PACKED / BYTE_STREAM_SPLIT rules
(reference: src/parquet-linter/src/rules/timestamp_encoding.rs:8-91,
src/parquet-linter/src/rules/float_encoding.rs:17-90). The reference never
implements packing itself (it delegates to arrow-rs writers); we implement it
here because the engine IS the encoder.

Performance model (measured in this sandbox):
- widths 8/16/32/64 → pure dtype casts (~2-4 GB/s)
- other widths → unpackbits/packbits matrix transform (~50-60 MB/s per core)
Packing runs block-wise so a multi-million-value chunk never materializes an
n×64 bit matrix at once. BLOCK is divisible by 8, so every full block is
byte-aligned and blocks concatenate into one contiguous bitstream; only the
final partial block is zero-padded to a byte boundary.
"""

from __future__ import annotations

import numpy as np

BLOCK = 1 << 18  # values per packing block; % 8 == 0 → no inter-block padding

_CAST_DTYPES = {8: np.uint8, 16: np.uint16, 32: np.uint32, 64: np.uint64}


def width_for(max_value: int) -> int:
    """Bit width needed for unsigned values in [0, max_value]."""
    return int(max_value).bit_length()


def pack_uints(vals: np.ndarray, width: int) -> bytes:
    """Pack unsigned integers (< 2**width) into a little-endian bitstream."""
    if width < 0 or width > 64:
        raise ValueError(f"width out of range: {width}")
    n = len(vals)
    if width == 0 or n == 0:
        return b""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    if width in _CAST_DTYPES:  # byte-aligned fast path: a cast IS the packing
        return v.astype(_CAST_DTYPES[width]).tobytes()
    parts = []
    for i in range(0, n, BLOCK):
        blk = v[i : i + BLOCK]
        bytes_le = blk.view(np.uint8).reshape(-1, 8)
        bits = np.unpackbits(bytes_le, axis=1, bitorder="little")
        parts.append(np.packbits(bits[:, :width], bitorder="little").tobytes())
    return b"".join(parts)


def unpack_uints(buf, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_uints`; returns uint64 array of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    if width in _CAST_DTYPES:
        return np.frombuffer(buf, dtype=_CAST_DTYPES[width], count=n).astype(np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    out = np.empty(n, dtype=np.uint64)
    full_block_bytes = BLOCK * width // 8
    pos = 0
    for i in range(0, n, BLOCK):
        cnt = min(BLOCK, n - i)
        nbytes = (cnt * width + 7) // 8
        bits = np.unpackbits(raw[pos : pos + nbytes], bitorder="little", count=cnt * width)
        full = np.zeros((cnt, 64), dtype=np.uint8)
        full[:, :width] = bits.reshape(cnt, width)
        out[i : i + cnt] = np.packbits(full, axis=1, bitorder="little").view(np.uint64).ravel()
        pos += full_block_bytes if cnt == BLOCK else nbytes
    return out


def sorted_factorize(arr: np.ndarray):
    """(sorted_unique_values, codes) — hash-based, ~20× faster than np.unique
    with return_inverse on large low-cardinality data; output identical."""
    import pandas as pd

    codes, vals = pd.factorize(arr)
    order = np.argsort(vals, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    return np.asarray(vals)[order], rank[codes]


def zigzag_encode(vals: np.ndarray) -> np.ndarray:
    """Map signed int64 → uint64 so small-magnitude values get small codes."""
    v = vals.astype(np.int64, copy=False)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def zigzag_decode(vals: np.ndarray) -> np.ndarray:
    v = vals.astype(np.uint64, copy=False)
    return ((v >> np.uint64(1)).astype(np.int64)) ^ -(v & np.uint64(1)).astype(np.int64)
