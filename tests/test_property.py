"""Property-based codec roundtrips (SURVEY.md §5 plan: random token arrays —
all-equal, runs, uniform-random, Zipf, empty, single, full int32 range)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from tokenlake.codecs import decode_column, encode_int_column
from tokenlake.codecs.bitio import pack_uints, unpack_uints
from tokenlake.stats import compute_chunk_stats
from tokenlake.select import select_codec

INT32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)
CODECS = ["plain", "for", "delta", "rle", "dict", "fsst"]


@st.composite
def token_arrays(draw):
    shape = draw(st.sampled_from(["raw", "runs", "zipf", "equal"]))
    n = draw(st.integers(min_value=0, max_value=3000))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    if shape == "raw" or n == 0:
        vals = draw(st.lists(INT32, min_size=min(n, 40), max_size=min(n, 40)))
        return np.array(vals, dtype=np.int32)
    if shape == "runs":
        runs = rng.integers(1, 50, max(n // 20, 1))
        return np.repeat(rng.integers(-100, 100, len(runs)), runs)[:n].astype(np.int32)
    if shape == "zipf":
        return np.minimum(rng.zipf(1.5, n), 2**31 - 1).astype(np.int32)
    return np.full(n, draw(INT32), dtype=np.int32)


@settings(max_examples=60, deadline=None)
@given(arr=token_arrays(), codec=st.sampled_from(CODECS))
def test_every_codec_roundtrips_any_array(arr, codec):
    buf = encode_int_column(arr, codec, outer="none")
    np.testing.assert_array_equal(decode_column(buf), arr)


@settings(max_examples=40, deadline=None)
@given(arr=token_arrays())
def test_auto_selection_roundtrips_and_never_blows_up(arr):
    st_ = compute_chunk_stats(arr, max(len(arr), 1))
    d = select_codec(arr, st_)
    buf = encode_int_column(arr, d.codec, outer="auto")
    np.testing.assert_array_equal(decode_column(buf), arr)
    assert len(buf) <= 4 * len(arr) + 64


@settings(max_examples=40, deadline=None)
@given(
    width=st.integers(min_value=0, max_value=64),
    n=st.integers(min_value=0, max_value=2000),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_pack_unpack_any_width(width, n, seed):
    hi = (1 << width) - 1 if width else 0
    vals = (
        np.random.default_rng(seed).integers(0, hi + 1 if hi < 2**63 else 2**63, n, dtype=np.uint64)
        if width
        else np.zeros(n, dtype=np.uint64)
    )
    if width == 64 and n:
        vals = vals * 2 + 1  # exercise the top bit
    assert np.array_equal(unpack_uints(pack_uints(vals, width), n, width), vals)


@settings(max_examples=40, deadline=None)
@given(
    arr=token_arrays(),
    codec=st.sampled_from(CODECS),
    cut=st.integers(min_value=1, max_value=64),
    outer=st.sampled_from(["none", "zstd"]),
)
def test_truncation_never_decodes_wrong(arr, codec, cut, outer):
    """Integrity property: decoding a truncated container either raises or
    (if the cut only removed redundancy) returns the EXACT original — it must
    never silently return fewer/other values. Backed by the raw_len check in
    container.unwrap."""
    buf = encode_int_column(arr, codec, outer=outer)
    cut = min(cut, len(buf) - 1)
    if cut <= 0:
        return
    try:
        out = decode_column(buf[: len(buf) - cut])
    except Exception:
        return
    np.testing.assert_array_equal(out, arr)
