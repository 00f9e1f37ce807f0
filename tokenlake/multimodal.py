"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a typed
metadata struct; decode / feature-extraction run as Arrow-batched
`mapInPandas` kernels.

Round 5: TWO REAL decoders now ship behind the round-4 contract registry —
no external libraries involved:

- `audio/wav` (`decode_wav`): RIFF/WAVE PCM via the stdlib `wave` module
  (8-bit PCM passes through; 16-bit downconverts to the uint8 contract).
- `image/png` (`decode_png`): a from-scratch PNG decoder — chunk walk with
  CRC validation, zlib inflate, and all five scanline filters (None/Sub/Up
  vectorized; Average/Paeth run their inherent per-pixel recurrence only on
  rows that actually use them). 8-bit grayscale / RGB / RGBA, no interlace.

Formats without a shipped decoder still raise NotImplementedError through
`decode_media` — the registry contract is unchanged.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id long, payload binary, media_type string, byte_len long, "
    "width int, height int"
)

FEATURE_SCHEMA = "doc_id long, byte_len long, feature array<float>"


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media: the utf-8 bytes of `text` become the opaque
    payload; metadata is derived (stands in for a real image/audio column)."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        payload.alias("payload"),
        F.lit("application/x-fake").alias("media_type"),
        F.length(payload).cast("long").alias("byte_len"),
        (F.length(payload) % 640).cast("int").alias("width"),
        (F.length(payload) % 480).cast("int").alias("height"),
    )


# --------------------------------------------------------------------------
# decoder contract (round 4): a real decoder plugs in behind this registry.
# The engine never imports an image library itself; an environment that has
# one registers `register_decoder("image/png", pil_decode)` and every
# decode_media call-site picks it up. tests/test_round4.py pins the contract
# a future real decoder must satisfy (deterministic, uint8 ndarray, shape
# checks, fixed input → fixed feature vector).
# --------------------------------------------------------------------------

DECODERS: dict[str, callable] = {}


def register_decoder(media_type: str, fn) -> None:
    """Register `fn(payload: bytes) -> np.ndarray` for a media type.

    Throughput contract: the built-in pure-Python JPEG/PNG decoders top out
    ~10-25 MB/s per core (Huffman symbol chase is inherently sequential —
    measured ceiling in BENCH/BASELINE.md §"media decode"). A production
    corpus at 100 TB needs a native decoder (PIL/libjpeg-turbo) registered
    here; it slots in with no other plumbing changes."""
    DECODERS[media_type] = fn


def decode_media(payload: bytes, media_type: str) -> np.ndarray:
    """Dispatch to a registered decoder and validate its output against the
    contract: a C-contiguous uint8 ndarray of rank 1 (audio samples),
    2 (grayscale), or 3 (H×W×C). Raises NotImplementedError when no decoder
    is registered — the honest state of this container."""
    fn = DECODERS.get(media_type)
    if fn is None:
        raise NotImplementedError(
            f"no decoder registered for {media_type!r}; media decode requires "
            "an image/audio library not present in this environment "
            "(register one via register_decoder)"
        )
    arr = fn(payload)
    if not isinstance(arr, np.ndarray) or arr.dtype != np.uint8 or arr.ndim not in (1, 2, 3):
        raise ValueError(
            f"decoder for {media_type!r} violated the contract: need a rank-1/2/3 "
            f"uint8 ndarray, got {type(arr).__name__}"
            + (f" dtype={arr.dtype} ndim={arr.ndim}" if isinstance(arr, np.ndarray) else "")
        )
    return np.ascontiguousarray(arr)


def decode_image_stub(payload: bytes) -> np.ndarray:
    """Historical stub slot for formats with no shipped decoder
    (progressive JPEG, video codecs, ...)."""
    raise NotImplementedError(
        "no decoder for this image format in this environment; "
        "register one via register_decoder"
    )


# --------------------------------------------------------------------------
# real decoders (round 5): WAV via stdlib wave; PNG from scratch
# --------------------------------------------------------------------------


def decode_wav(payload: bytes) -> np.ndarray:
    """RIFF/WAVE PCM → rank-1 uint8 sample array (the registry contract).
    8-bit PCM is already unsigned bytes; 16-bit PCM downconverts by taking
    the high byte re-biased to unsigned. Channels are interleaved as stored."""
    import io
    import wave

    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 1:
        return np.frombuffer(raw, np.uint8).copy()
    if sw == 2:
        s = np.frombuffer(raw, "<i2").astype(np.int32)
        return ((s + 32768) >> 8).astype(np.uint8)
    raise ValueError(f"unsupported WAV sample width {sw} (need 8- or 16-bit PCM)")


def encode_wav(samples: np.ndarray, rate: int = 8000, channels: int = 1) -> bytes:
    """Deterministic WAV writer (8-bit PCM) — the test-fixture twin of
    decode_wav; any standard audio tool can open its output."""
    import io
    import wave

    samples = np.ascontiguousarray(samples, dtype=np.uint8)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(1)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # grayscale, RGB, RGBA


def decode_png(payload: bytes) -> np.ndarray:
    """From-scratch PNG decode: chunk walk (CRC-validated), zlib inflate,
    scanline unfilter. Returns H×W uint8 (grayscale) or H×W×C (RGB/RGBA).

    Filters None/Sub/Up are fully vectorized (Sub is a per-lane cumulative
    sum mod 256); Average and Paeth carry an inherent per-pixel recurrence,
    paid only on scanlines that use them."""
    payload = bytes(payload)
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, hdr = 8, [], None
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        if pos + 12 + ln > len(payload):
            # declared length overruns the buffer: raise the family's
            # uniform ValueError instead of letting the CRC unpack_from
            # throw struct.error (or silently CRC-check truncated data)
            raise ValueError("truncated PNG chunk (declared length overruns payload)")
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(payload[pos + 4 : pos + 8 + ln]) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if hdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = hdr
    if depth != 8 or color not in _PNG_CHANNELS or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG shape (depth={depth} color={color} "
            f"interlace={interlace}); need 8-bit gray/RGB/RGBA, no interlace"
        )
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data has the wrong length")
    rows = raw.reshape(h, stride + 1)
    ftypes = rows[:, 0]
    out = np.zeros((h, stride), np.uint8)
    for y in range(h):
        f = int(ftypes[y])
        r = rows[y, 1:]
        prev = out[y - 1] if y else np.zeros(stride, np.uint8)
        if f == 0:  # None
            out[y] = r
        elif f == 1:  # Sub: per-lane cumsum mod 256
            out[y] = (
                r.reshape(w, ch).astype(np.int64).cumsum(axis=0) % 256
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up (uint8 wraparound add)
            out[y] = r + prev
        elif f == 3:  # Average — inherent left-neighbor recurrence; run it
            # over plain Python lists (one bulk tolist per row) instead of
            # per-element numpy indexing, which boxes a scalar every access
            rl, pl = r.tolist(), prev.tolist()
            cur = [0] * stride
            for i in range(ch):
                cur[i] = (rl[i] + (pl[i] >> 1)) & 0xFF
            for i in range(ch, stride):
                cur[i] = (rl[i] + ((cur[i - ch] + pl[i]) >> 1)) & 0xFF
            out[y] = cur
        elif f == 4:  # Paeth — same recurrence treatment as Average
            rl, pl = r.tolist(), prev.tolist()
            cur = [0] * stride
            for i in range(ch):
                # a = c = 0: predictor reduces to b = prev[i]
                cur[i] = (rl[i] + pl[i]) & 0xFF
            for i in range(ch, stride):
                a, b, c = cur[i - ch], pl[i], pl[i - ch]
                p = a + b - c
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc2 = p - c if p >= c else c - p
                pred = a if (pa <= pb and pa <= pc2) else b if pb <= pc2 else c
                cur[i] = (rl[i] + pred) & 0xFF
            out[y] = cur
        else:
            raise ValueError(f"unknown PNG filter type {f}")
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal standards-conforming PNG writer (8-bit gray/RGB/RGBA, one
    IDAT, one filter type for every scanline) — the test-fixture twin of
    decode_png; its output opens in any standard viewer."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w, ch, color = *arr.shape, 1, 0
        flat = arr.reshape(h, w)
    elif arr.ndim == 3 and arr.shape[2] in (3, 4):
        h, w, ch = arr.shape
        color = 2 if ch == 3 else 6
        flat = arr.reshape(h, w * ch)
    else:
        raise ValueError("need H×W (gray) or H×W×{3,4} (RGB/RGBA) uint8")
    stride = w * ch
    lines = []
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        cur = flat[y].astype(np.int32)
        left = np.zeros(stride, np.int32)
        left[ch:] = cur[:-ch]
        upleft = np.zeros(stride, np.int32)
        upleft[ch:] = prev[:-ch]
        if filter_type == 0:
            filtered = cur
        elif filter_type == 1:
            filtered = cur - left
        elif filter_type == 2:
            filtered = cur - prev
        elif filter_type == 3:
            filtered = cur - ((left + prev) >> 1)
        elif filter_type == 4:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filtered = cur - pred
        else:
            raise ValueError("filter_type must be 0-4")
        lines.append(bytes([filter_type]) + (filtered & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


register_decoder("audio/wav", decode_wav)
register_decoder("image/png", decode_png)

# JPEG (baseline sequential, ITU-T T.81) — from-scratch Huffman+DCT decode
# in jpeg_codec.py; registered lazily at import so the contract tests and
# Spark feature kernels pick it up exactly like WAV/PNG.
from .jpeg_codec import decode_jpeg  # noqa: E402

register_decoder("image/jpeg", decode_jpeg)


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over media payloads.

    Payloads whose media_type has a REGISTERED decoder (WAV/PNG ship by
    default) are actually decoded — features are segment means over the
    decoded uint8 samples/pixels; undecodable types fall back to raw-byte
    segment means (schema-identical, deterministic). The decode itself is
    inherently per-payload; everything after it — segment boundaries,
    prefix sums, means — is one vectorized pass over the concatenated
    sample buffer of the whole Arrow batch.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload_lens = pdf["payload"].str.len().to_numpy(np.int64)
            decoded = [
                decode_media(p, mt).ravel() if mt in DECODERS
                else np.frombuffer(p, dtype=np.uint8)
                for p, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            lens = np.array([len(d) for d in decoded], dtype=np.int64)
            buf = (
                np.concatenate(decoded) if decoded else np.empty(0, np.uint8)
            )
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            bounds = starts[:, None] + (np.arange(dim + 1, dtype=np.int64)[None, :] * lens[:, None]) // dim
            prefix = np.zeros(len(buf) + 1, dtype=np.float64)
            np.cumsum(buf, out=prefix[1:], dtype=np.float64)
            seg_sum = prefix[bounds[:, 1:]] - prefix[bounds[:, :-1]]
            seg_cnt = bounds[:, 1:] - bounds[:, :-1]
            means = np.where(seg_cnt > 0, seg_sum / np.maximum(seg_cnt, 1), 0.0).astype(np.float32)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payload_lens,
                    "feature": list(means),
                }
            )

    return media.select("doc_id", "payload", "media_type").mapInPandas(kernel, FEATURE_SCHEMA)


def _sawtooth_wav(did: int, nch: int) -> bytes:
    """The deterministic per-document WAV fixture both attach kernels share:
    a sawtooth whose length/step derive from the doc."""
    n = int(nch) % 400 + 40
    step = int(did) % 17 + 1
    samples = ((np.arange(n, dtype=np.int64) * step) % 256).astype(np.uint8)
    return encode_wav(samples)


def attach_wav_media(docs: DataFrame) -> DataFrame:
    """REAL media fixtures: a deterministic 8-bit PCM WAV per document,
    playable by any standard audio tool — the registered audio/wav decoder
    then actually parses RIFF frames on the feature path."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _sawtooth_wav(did, nch)
                for did, nch in zip(pdf["doc_id"], pdf["n_chars"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": rows,
                    "media_type": "audio/wav",
                    "byte_len": [len(r) for r in rows],
                    "width": np.zeros(len(rows), np.int32),
                    "height": np.zeros(len(rows), np.int32),
                }
            )

    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.col("n_chars")
    ).mapInPandas(kernel, MEDIA_SCHEMA)


def attach_mixed_media(docs: DataFrame) -> DataFrame:
    """REAL media fixtures across TWO registered formats: docs with
    doc_id % 5 == 0 carry a deterministic single-block grayscale JPEG
    (flat value seeded by the doc — flat blocks round-trip EXACTLY through
    quant=1 DCT, so a SQL oracle can replay the decoded pixels), the rest
    the attach_wav_media sawtooth WAV (8-bit PCM — also exact). One feature
    pass exercises both shipped decoders with oracle-replayable output."""
    from .jpeg_codec import encode_jpeg

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows, kinds, widths, heights = [], [], [], []
            for did, nch in zip(pdf["doc_id"], pdf["n_chars"]):
                did = int(did)
                if did % 5 == 0:
                    v = (did % 29) * 8 + 3
                    g = np.full((8, 8), v, np.uint8)
                    rows.append(encode_jpeg(g))
                    kinds.append("image/jpeg")
                    widths.append(8)
                    heights.append(8)
                else:
                    rows.append(_sawtooth_wav(did, nch))
                    kinds.append("audio/wav")
                    widths.append(0)
                    heights.append(0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": rows,
                    "media_type": kinds,
                    "byte_len": [len(r) for r in rows],
                    "width": np.asarray(widths, np.int32),
                    "height": np.asarray(heights, np.int32),
                }
            )

    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.col("n_chars")
    ).mapInPandas(kernel, MEDIA_SCHEMA)


def media_meta(media: DataFrame) -> DataFrame:
    """Metadata projection — stays entirely in whole-stage codegen."""
    return media.select("doc_id", "media_type", "byte_len", "width", "height")
