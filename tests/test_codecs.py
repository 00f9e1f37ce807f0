"""Codec roundtrip + size tests (SURVEY.md §5 categories 1 and property-based).

Mirrors the reference's pure-function unit-test style
(src/parquet-linter/src/rules/dictionary_encoding.rs:484-525 etc.): every
profile from FIXTURES.md §1 must roundtrip bit-identically through every
codec, and each profile's *expected winner* must actually be small.
"""

import numpy as np
import pyarrow as pa
import pytest

from tokenlake.codecs import codec_of, decode_column, encode_int_column, encode_str_column
from tokenlake.codecs.bitio import pack_uints, unpack_uints, zigzag_decode, zigzag_encode

INT_CODECS = ["plain", "for", "bitpack", "delta", "rle", "dict", "fsst"]

RNG = np.random.default_rng(42)

PROFILES = {
    "empty": np.empty(0, dtype=np.int32),
    "single": np.array([7], dtype=np.int32),
    "all_equal": np.full(5000, 123456, dtype=np.int32),
    "lowcard": RNG.integers(0, 500, 20000).astype(np.int32),
    "runs": np.repeat(RNG.integers(0, 20, 50), RNG.integers(100, 500, 50)).astype(np.int32),
    "sorted_ts": np.cumsum(RNG.integers(1, 50, 20000)).astype(np.int32),
    "smallrange": (100000 + RNG.integers(0, 1 << 12, 20000)).astype(np.int32),
    "random_full": RNG.integers(-(2**31), 2**31, 20000, dtype=np.int64).astype(np.int32),
    "extremes": np.array([0, -1, 1, 2**31 - 1, -(2**31), 0, 0], dtype=np.int32),
    "negatives": RNG.integers(-1000, -1, 10000).astype(np.int32),
}


def make_ngram_profile() -> np.ndarray:
    rng = np.random.default_rng(7)
    phrases = [rng.integers(0, 5000, rng.integers(4, 9)).astype(np.int32) for _ in range(200)]
    parts = []
    for _ in range(2000):
        if rng.random() < 0.9:
            parts.append(phrases[rng.integers(0, 200)])
        else:
            parts.append(rng.integers(0, 5000, 4).astype(np.int32))
    return np.concatenate(parts)


PROFILES["ngram"] = make_ngram_profile()


@pytest.mark.parametrize("codec", INT_CODECS)
@pytest.mark.parametrize("profile", sorted(PROFILES))
def test_int_roundtrip_bit_identical(codec, profile):
    arr = PROFILES[profile]
    for outer in ("none", "auto", "zlib:1", "zstd:3", "lz4"):
        buf = encode_int_column(arr, codec, outer=outer)
        out = decode_column(buf)
        assert out.dtype == np.int32
        np.testing.assert_array_equal(out, arr)


def test_bitio_roundtrip_widths():
    for w in [0, 1, 3, 7, 8, 13, 20, 31, 32, 40, 64]:
        n = 3001
        hi = (1 << w) - 1 if w else 0
        vals = np.random.default_rng(w).integers(0, hi + 1, n, dtype=np.uint64) if w else np.zeros(n, np.uint64)
        assert np.array_equal(unpack_uints(pack_uints(vals, w), n, w), vals)


def test_bitio_multiblock():
    n = (1 << 20) + 12345  # crosses a packing block boundary
    vals = np.random.default_rng(0).integers(0, 1 << 11, n, dtype=np.uint64)
    assert np.array_equal(unpack_uints(pack_uints(vals, 11), n, 11), vals)


def test_zigzag():
    v = np.array([0, -1, 1, -2, 2, 2**31 - 1, -(2**31)], dtype=np.int64)
    assert np.array_equal(zigzag_decode(zigzag_encode(v)), v)


def expected_small(arr, codec, vs="plain", factor=0.5):
    raw = encode_int_column(arr, vs, outer="none")
    enc = encode_int_column(arr, codec, outer="none")
    assert len(enc) < factor * len(raw), f"{codec}: {len(enc)} !< {factor}*{len(raw)}"


def test_profile_winners_compress():
    """Each FIXTURES.md profile's expected codec genuinely beats plain."""
    expected_small(PROFILES["lowcard"], "dict")       # R1: ratio<0.1 ⇒ dict
    expected_small(PROFILES["runs"], "rle", factor=0.05)
    expected_small(PROFILES["sorted_ts"], "delta")    # R6: monotone ⇒ delta
    expected_small(PROFILES["smallrange"], "for")     # FOR: 12-bit range
    expected_small(PROFILES["ngram"], "fsst")         # R5 analog: phrase structure
    expected_small(PROFILES["all_equal"], "rle", factor=0.01)


def test_random_stays_near_plain():
    """R3 analog: incompressible data must not blow up under any codec."""
    arr = PROFILES["random_full"]
    plain = len(encode_int_column(arr, "plain", outer="none"))
    for codec in ["for", "delta"]:
        assert len(encode_int_column(arr, codec, outer="none")) < 1.10 * plain


def test_auto_outer_skipped_when_incompressible():
    arr = PROFILES["random_full"]
    buf = encode_int_column(arr, "plain", outer="auto")
    name, outer = codec_of(buf)
    assert name == "plain" and outer == "none"  # R3: ratio>0.95 ⇒ no outer layer


def test_str_roundtrip():
    vals = [f"src-{i % 7}-{'x' * (i % 31)}" for i in range(5000)] + ["", "unicode-✓-日本語"]
    for codec in ("str_plain", "str_dict"):
        buf = encode_str_column(vals, codec, outer="none")
        out = decode_column(buf)
        assert isinstance(out, pa.Array)
        assert out.to_pylist() == vals


def test_str_dict_compresses_lowcard():
    vals = [f"source-{i % 5}" for i in range(20000)]
    d = len(encode_str_column(vals, "str_dict", outer="none"))
    p = len(encode_str_column(vals, "str_plain", outer="none"))
    assert d < 0.2 * p


def test_fsst_table_bounded():
    """FSST composite-symbol budget is bounded (token-alphabet variant of the
    FSST paper's fixed-size table; ours is _FSST_MAX_SYMBOLS entries)."""
    from tokenlake.codecs.intcodecs import _FSST_MAX_SYMBOLS, enc_fsst
    import struct
    body = enc_fsst(PROFILES["ngram"])
    (vlen,) = struct.unpack_from("<I", body, 4)
    (npairs,) = struct.unpack_from("<H", body, 8 + vlen)
    assert npairs <= _FSST_MAX_SYMBOLS


def test_fsst_pairs_survive_large_vocabularies():
    """Pair keys must be 64-bit: numpy 1.x value-based promotion kept
    int32_array * int64_scalar in int32, wrapping keys for vocabularies
    past ~46341 symbols — the exact verify then rejected every candidate
    and fsst silently degenerated to a dict-map (npairs=0) on exactly the
    50K-200K vocabularies real tokenizers produce."""
    import struct

    import numpy as np

    from tokenlake.codecs import decode_column, encode_int_column

    rng = np.random.default_rng(5)
    n = 200_000
    flat = rng.integers(0, 60_000, n).astype(np.int32)
    pos = rng.choice(n - 1, n // 8, replace=False)
    flat[pos], flat[pos + 1] = 123, 456  # one digram covers ~25% of the stream
    body = encode_int_column(flat, "fsst", outer="none")
    assert np.array_equal(decode_column(body), flat)
    dict_bytes = len(encode_int_column(flat, "dict", outer="none"))
    # with the digram captured, fsst must beat plain dict-mapping
    assert len(body) < dict_bytes, (len(body), dict_bytes)
