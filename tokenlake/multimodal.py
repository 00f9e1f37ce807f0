"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a typed
metadata struct; decode / feature-extraction run as Arrow-batched
`mapInPandas` kernels. The actual media decode is STUBBED (no image/audio
libraries in this container — see `decode_image_stub`), but the Spark-side
plumbing — schema, batch shape, partitioning, UDF signature — is real and
tested.
"""

from __future__ import annotations

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
    """Register `fn(payload: bytes) -> np.ndarray` for a media type."""
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
    """Where a real pixel decode would go (PIL/libvips not in this container)."""
    raise NotImplementedError(
        "media decode requires an image library not present in this environment; "
        "extract_features uses a deterministic fake instead"
    )


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over binary payloads.

    The per-batch kernel is fully vectorized: a real implementation would
    decode pixels/samples here; the deterministic fake hashes fixed-stride
    byte slices so outputs are reproducible and schema-correct.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens = pdf["payload"].str.len().to_numpy(np.int64)
            # one C-level concat of the batch, then pure array math: segment
            # boundaries floor(start + i*len/dim), means via prefix-sum
            # differences — no per-row Python loop (batch-vectorized).
            buf = np.frombuffer(b"".join(pdf["payload"]), dtype=np.uint8)
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
                    "byte_len": lens,
                    "feature": list(means),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(kernel, FEATURE_SCHEMA)


def media_meta(media: DataFrame) -> DataFrame:
    """Metadata projection — stays entirely in whole-stage codegen."""
    return media.select("doc_id", "media_type", "byte_len", "width", "height")
