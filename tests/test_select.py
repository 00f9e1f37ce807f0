"""Selection-threshold unit tests — SURVEY.md §5 category 1+2: the
"reproducing parquet-linter's encoding-selection expectations" gate
(FIXTURES.md §4 invariant 5)."""

import numpy as np
import pytest

from tokenlake.schema import EXPECTED_WINNER, generate_sequences
from tokenlake.select import (
    DICT_ENABLE_RATIO,
    DICT_REJECT_RATIO,
    candidate_codecs,
    select_codec,
)
from tokenlake.stats import compute_chunk_stats, scale_distinct


def flat_of(profile: str, scale=0.2):
    tbl = generate_sequences(scale=scale, profiles=[profile], skew=False)
    tokens = tbl["tokens"].combine_chunks()
    return tokens.flatten().to_numpy().astype(np.int32), tbl.num_rows


@pytest.mark.parametrize("profile", sorted(EXPECTED_WINNER))
def test_profile_selects_expected_codec(profile):
    flat, n_rows = flat_of(profile)
    stats = compute_chunk_stats(flat, n_rows)
    d = select_codec(flat, stats)
    expected = EXPECTED_WINNER[profile]
    if isinstance(expected, set):
        assert d.codec in expected, f"{profile}: {d.codec} not in {expected} ({d.candidates})"
    else:
        assert d.codec == expected, f"{profile}: {d.codec} != {expected} ({d.candidates})"


def test_highcard_rejects_dict():
    """R1: cardinality ratio > 0.5 ⇒ dictionary not even a candidate
    (dictionary_encoding.rs:384-398)."""
    flat, n_rows = flat_of("highcard")
    stats = compute_chunk_stats(flat, n_rows)
    assert stats.cardinality_ratio > DICT_REJECT_RATIO
    assert "dict" not in candidate_codecs(stats)


def test_lowcard_ratio_below_enable():
    flat, n_rows = flat_of("lowcard")
    stats = compute_chunk_stats(flat, n_rows)
    assert stats.cardinality_ratio < DICT_ENABLE_RATIO


def test_scale_distinct_clamping():
    """cardinality.rs:148-157 + :317-332 semantics."""
    assert scale_distinct(100, 1000, 10_000) == 1000
    assert scale_distinct(100, 100, 10_000) == 10_000      # all-distinct sample
    assert scale_distinct(5, 1000, 10_000) == 50
    assert scale_distinct(5, 1000, 500) == 5                # sample ≥ total
    assert scale_distinct(0, 0, 100) == 0
    # clamp low: never below sample distinct
    assert scale_distinct(77, 10_000, 10_001) == 77


def test_random_full_range_gets_plain():
    """R3: incompressible ⇒ plain (compression_ratio.rs:47-57)."""
    flat, n_rows = flat_of("random")
    d = select_codec(flat, compute_chunk_stats(flat, n_rows))
    assert d.codec == "plain"
    assert d.rule == "low-compression-ratio"


def test_forced_codec_respected():
    flat, n_rows = flat_of("lowcard", scale=0.05)
    d = select_codec(flat, compute_chunk_stats(flat, n_rows), forced="rle")
    assert d.codec == "rle" and d.rule == "forced"


def test_empty_chunk():
    stats = compute_chunk_stats(np.empty(0, dtype=np.int32), 0)
    d = select_codec(np.empty(0, dtype=np.int32), stats)
    assert d.codec in ("plain", "for", "rle", "delta")  # anything roundtrips empty
