"""Self-describing encoded-payload container + general-purpose outer layer.

Mirrors the reference's two-level choice: a *light encoding* (dictionary /
delta / RLE / bit-pack — reference rules R1/R4/R5/R6) wrapped in an optional
*general-purpose codec* (reference R2 `compression-codec-upgrade`,
src/parquet-linter/src/rules/compression_codec.rs:125-298, picks ZSTD-3 for
size vs LZ4 for speed; R3 `low-compression-ratio`,
src/parquet-linter/src/rules/compression_ratio.rs:14-76, drops the outer layer
when it saves <5%). In this sandbox the stdlib general-purpose codec is zlib:
level 6 plays the "size" role (zstd-3 analog) and level 1 the "speed" role
(lz4 analog).

Layout: b"TL" | version u8 | codec_id u8 | flags u8 (bit0 = zlib) |
        zlib_level u8 | body (possibly zlib-compressed)
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from . import intcodecs, strcodecs

MAGIC = b"TL"
VERSION = 1
FLAG_ZLIB = 1

CODEC_NAMES = {**intcodecs.INT_CODEC_NAMES, **strcodecs.STR_CODEC_NAMES}
CODEC_IDS = {**intcodecs.INT_CODEC_IDS, **strcodecs.STR_CODEC_IDS}

# R3 analog: keep the outer layer only if it saves ≥5% (ratio > 0.95 ⇒ skip,
# reference compression_ratio.rs:47-57)
OUTER_KEEP_RATIO = 0.95
# R2 analog: chunks larger than 4 MB prefer the fast level (compression_codec.rs:8-20)
SPEED_THRESHOLD_BYTES = 4 << 20
LEVEL_SIZE = 6
LEVEL_SPEED = 1
_TRIAL_BYTES = 1 << 16  # outer-layer trial sample size


def wrap(codec_id: int, body: bytes, outer: str = "auto") -> bytes:
    """Frame a codec body, optionally zlib-compressing it.

    outer: "auto" (R2/R3 policy), "none", or "zlib[:level]".
    """
    flags, level, payload = 0, 0, body
    if outer == "auto":
        level = LEVEL_SPEED if len(body) > SPEED_THRESHOLD_BYTES else LEVEL_SIZE
        # R3 trial on a bounded sample first (reference samples ≤16,384 rows,
        # column_context.rs:543): never pay full-body compression to learn "no"
        # tail sample: bodies lead with small compressible tables (dict/fsst)
        # and end with the packed value stream that dominates the bytes
        sample = body if len(body) <= _TRIAL_BYTES else body[-_TRIAL_BYTES:]
        if len(zlib.compress(sample, level)) < OUTER_KEEP_RATIO * len(sample):
            z = zlib.compress(body, level)
            if len(z) < OUTER_KEEP_RATIO * len(body):
                flags, payload = FLAG_ZLIB, z
            else:
                level = 0
        else:
            level = 0
    elif outer.startswith("zlib"):
        level = int(outer.split(":", 1)[1]) if ":" in outer else LEVEL_SIZE
        flags, payload = FLAG_ZLIB, zlib.compress(body, level)
    elif outer != "none":
        raise ValueError(f"unknown outer layer: {outer}")
    return MAGIC + bytes([VERSION, codec_id, flags, level]) + payload


def unwrap(buf: bytes | memoryview) -> tuple[int, memoryview]:
    mv = memoryview(buf)
    if bytes(mv[:2]) != MAGIC or mv[2] != VERSION:
        raise ValueError("bad container header")
    codec_id, flags = mv[3], mv[4]
    body = mv[6:]
    if flags & FLAG_ZLIB:
        body = memoryview(zlib.decompress(body))
    return codec_id, body


def encode_int_column(arr: np.ndarray, codec: str, outer: str = "auto") -> bytes:
    cid = intcodecs.INT_CODEC_IDS[codec]
    return wrap(cid, intcodecs.encode_int_body(cid, arr), outer)


def encode_str_column(values, codec: str, outer: str = "auto") -> bytes:
    cid = strcodecs.STR_CODEC_IDS[codec]
    return wrap(cid, strcodecs.encode_str_body(cid, values), outer)


def decode_column(buf: bytes | memoryview):
    """Decode any framed payload → np.int32 array or pa.Array of strings."""
    cid, body = unwrap(buf)
    if cid in intcodecs.INT_CODEC_NAMES:
        return intcodecs.decode_int_body(cid, body)
    return strcodecs.decode_str_body(cid, body)


def codec_of(buf: bytes | memoryview) -> tuple[str, bool]:
    """(codec_name, outer_zlib?) without decoding."""
    mv = memoryview(buf)
    return CODEC_NAMES[mv[3]], bool(mv[4] & FLAG_ZLIB)
