"""Lightweight columnar codecs: int32 token streams + string columns.

Codec set per BASELINE.json north_rule: dictionary, RLE, FSST (token-n-gram
symbol table), bit-packing, frame-of-reference — plus plain and an optional
zlib outer layer (general-purpose codec analog of reference rule R2/R3).
"""

from .container import (
    CODEC_IDS,
    CODEC_NAMES,
    DTYPE_SPARK,
    SPARK_DTYPE,
    codec_of,
    decode_column,
    decode_column_arrow,
    dtype_of,
    dtype_of_arrow,
    encode_any_column,
    encode_int_column,
    encode_str_column,
)
from .intcodecs import INT_CODEC_IDS, INT_CODEC_NAMES
from .strcodecs import STR_CODEC_IDS, STR_CODEC_NAMES

__all__ = [
    "CODEC_IDS",
    "CODEC_NAMES",
    "DTYPE_SPARK",
    "SPARK_DTYPE",
    "codec_of",
    "decode_column",
    "decode_column_arrow",
    "dtype_of",
    "dtype_of_arrow",
    "encode_any_column",
    "encode_int_column",
    "encode_str_column",
    "INT_CODEC_IDS",
    "INT_CODEC_NAMES",
    "STR_CODEC_IDS",
    "STR_CODEC_NAMES",
]
