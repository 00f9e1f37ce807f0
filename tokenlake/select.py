"""Codec auto-selection: linter rule thresholds as priors + sampled cost model.

The reference's ten lint rules ARE its codec-selection logic (SURVEY.md §2.4);
here they prune the candidate set, then a sampled cost estimate picks the
winner — the "sampled cost-based codec auto-selection" of the north_star.

Threshold provenance (reference, src/parquet-linter/src/rules/):
- R1 dictionary: enable when cardinality_ratio < 0.1, reject when > 0.5
  (dictionary_encoding.rs:12-19, 384-398, 460-474); dictionary payload
  headroom ×1.25 (estimate_dictionary_payload_bytes, :183-201)
- R3 low-compression-ratio: if the best candidate saves < 5% vs plain, emit
  plain (ratio > 0.95 ⇒ UNCOMPRESSED, compression_ratio.rs:47-57)
- R6 delta: monotone-ish integer streams ⇒ DELTA_BINARY_PACKED
  (timestamp_encoding.rs:66-87)
- R5 string-encoding analog: dictionary-unfriendly-but-structured payloads ⇒
  symbol-table (FSST) candidate (string_encoding.rs:57-188)
- Conservative fallback: unknown cardinality ⇒ assume all-distinct
  (cardinality.rs:102-113) — realized here by distinct_est's clamping.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .codecs.bitio import width_for
from .stats import ChunkStats, scale_distinct

# R1 thresholds (dictionary_encoding.rs:12-19)
DICT_ENABLE_RATIO = 0.1
DICT_REJECT_RATIO = 0.5
DICT_HEADROOM = 1.25
# R1 growth flow (dictionary_encoding.rs:203-218): 2 MB start, doubling to 16 MB
DICT_PAGE_SIZE_START = 2 << 20
DICT_PAGE_SIZE_MAX = 16 << 20
# R3 threshold (compression_ratio.rs:47-57)
LOW_RATIO = 0.95
# R6: sortedness needed to consider delta
DELTA_SORTED_FRAC = 0.90
# RLE viability: sampled run ratio
RLE_RUN_RATIO = 0.5
# FSST gate: needs repeated structure → bounded alphabet in the sample
FSST_MAX_RATIO = 0.25

_HEADER = 32  # container + body headers, approx


@dataclass
class Decision:
    """One row of the decisions DataFrame — the Diagnostic analog
    (src/parquet-linter/src/diagnostic.rs:55-61)."""

    codec: str
    est_bytes: int
    rule: str
    severity: str = "suggestion"
    candidates: dict = field(default_factory=dict)


def estimate_bytes(stats: ChunkStats, codec: str, wide: bool = False) -> int:
    """Analytical size estimate from sampled stats (no data pass).
    `wide` = 64-bit element stream (int64/double/timestamp): plain costs
    8 B/value and the bit-width-based estimates already scale with the real
    value range, so only plain needs the switch."""
    n = stats.n_values
    if n == 0:
        return _HEADER
    if codec == "plain":
        return (8 if wide else 4) * n + _HEADER
    if codec in ("for", "bitpack"):
        w = width_for(stats.max_val - stats.min_val)
        return (w * n + 7) // 8 + _HEADER
    if codec == "delta":
        # miniblock layout: per-block widths + 1 width byte per 128 values
        return int(stats.avg_delta_width * max(n - 1, 0) / 8) + n // 128 + _HEADER
    if codec == "dict":
        ndv = max(stats.distinct_est, 1)
        idx_w = width_for(ndv - 1)
        val_range = stats.max_val - stats.min_val
        gap_w = width_for(max(val_range // max(ndv - 1, 1), 1) * 4)  # dict values delta-packed
        table = int((gap_w * ndv + 7) // 8 * DICT_HEADROOM)  # ×1.25 headroom (R1)
        return table + (idx_w * n + 7) // 8 + _HEADER
    if codec == "rle":
        runs = max(1, int(round(stats.run_ratio * n)))
        val_w = width_for(stats.max_val - stats.min_val)
        len_w = 16  # typical run-length width estimate
        return (runs * (val_w + len_w) + 7) // 8 + _HEADER
    raise ValueError(f"no analytical estimate for {codec}")


def estimate_dictionary_payload_bytes(stats: ChunkStats) -> int:
    """Estimated dictionary-table bytes with ×1.25 headroom (reference
    estimate_dictionary_payload_bytes, dictionary_encoding.rs:183-201):
    ndv × 4 B per int32 entry, before the value-gap bit-packing."""
    return int(max(stats.distinct_est, 1) * 4 * DICT_HEADROOM)


def classify_dict_chunk(stats: ChunkStats, dict_page_limit: int | None) -> str:
    """R1's chunk classification (flow chart, dictionary_encoding.rs:21-68):
    NoDict when cardinality says dictionary can't pay (ratio > 0.5), Fallback
    when the table would overflow the dictionary page limit mid-chunk,
    DictOnly otherwise."""
    if stats.cardinality_ratio > DICT_REJECT_RATIO:
        return "NoDict"
    if dict_page_limit is not None and estimate_dictionary_payload_bytes(stats) > dict_page_limit:
        return "Fallback"
    return "DictOnly"


def suggested_dictionary_page_size_limit(payload_bytes: int) -> int | None:
    """Smallest power-of-two page size ≥ payload (2 MB doubling to ≤16 MB,
    dictionary_encoding.rs:203-218); None when even 16 MB can't hold it."""
    size = DICT_PAGE_SIZE_START
    while size < payload_bytes:
        if size >= DICT_PAGE_SIZE_MAX:
            return None
        size *= 2
    return size


def suggested_max_chunk_rows(current_rows: int, payload_bytes: int, limit: int = DICT_PAGE_SIZE_MAX) -> int:
    """When the dictionary can't fit even the max page, shrink the chunk so
    it can (suggested_max_row_group_size, dictionary_encoding.rs:229-240):
    rows × limit/payload, floored to ≥1."""
    if payload_bytes <= limit:
        return current_rows
    return max(1, int(current_rows * limit / payload_bytes))


def candidate_codecs(
    stats: ChunkStats,
    allow_dict: bool = True,
    dict_page_limit: int | None = None,
    allow_fsst: bool = True,
) -> list[str]:
    """Rule-threshold pruning → candidate set (cheap, no data pass).
    `allow_fsst=False` for 64-bit streams (fsst is int32-only by contract)."""
    cands = ["plain", "for"]
    ratio = stats.cardinality_ratio
    # R1: ratio > 0.5 ⇒ never dictionary; a directed page limit the table
    # would overflow (Fallback) also removes the candidate
    if allow_dict and classify_dict_chunk(stats, dict_page_limit) == "DictOnly":
        cands.append("dict")
    if stats.run_ratio < RLE_RUN_RATIO:
        cands.append("rle")
    if stats.sorted_frac >= DELTA_SORTED_FRAC or width_for(stats.max_zz_delta) < width_for(
        max(stats.max_val - stats.min_val, 1)
    ):
        cands.append("delta")
    if allow_fsst and ratio < FSST_MAX_RATIO and stats.n_values >= 1024:
        cands.append("fsst")
    return cands


# trial-based estimates carry extrapolation risk an analytical candidate
# doesn't — a 10% premium breaks near-ties toward deterministic codecs
_FSST_EST_PREMIUM = 1.10


def _fsst_trial_bytes(flat: np.ndarray, stats: ChunkStats) -> int:
    """FSST has no closed-form estimate → trial-encode and extrapolate.

    The old single-trial model scaled the WHOLE head-sample body by
    n/sample: the fixed symbol-table cost was counted n/16384 times
    (overestimating repetitive chunks ~5×, fsst losing races it wins) while
    the head-local pair fit understated the marginal on unseen data
    (underestimating lowcard-random chunks, fsst winning races it loses).
    Three bounded trials separate the effects:

    - half-head vs head  → marg_head (table amortized out of the slope);
    - head vs head+TAIL  → marg_tail (cost of genuinely distant data under
      the head-trained pairs — the deployment regime, since the full
      encode trains its pairs on the same head sample);
    - est = (b_head_tail + max(marg) × remaining) × premium, the premium
      because enc_fsst's round acceptance is sample-local and its stream
      width grows with accepted pairs — a size-dependent inefficiency no
      bounded trial can observe (measured ≤ 1.26× across the fixture
      profiles with every codec race landing on the expected winner)."""
    from .codecs.intcodecs import enc_fsst
    from .stats import SAMPLE_VALUES

    S = SAMPLE_VALUES
    sample = flat[:S]
    if len(sample) == 0:
        return _HEADER
    b_head = len(enc_fsst(sample))
    n = stats.n_values
    if n <= len(sample):
        return b_head + _HEADER  # the trial IS the chunk: exact
    if n <= 2 * S and n <= len(flat):
        return len(enc_fsst(flat[:n])) + _HEADER
    b_half = len(enc_fsst(sample[: max(len(sample) // 2, 1)]))
    marg_head = max((b_head - b_half) / max(len(sample) - len(sample) // 2, 1), 0.0)
    probe = np.concatenate([sample, flat[-min(S, max(len(flat) - len(sample), 1)):]])
    b_ht = len(enc_fsst(probe))
    marg_tail = max((b_ht - b_head) / max(len(probe) - len(sample), 1), 0.0)
    marg = max(marg_tail, marg_head)
    return int((b_ht + marg * max(n - len(probe), 0)) * _FSST_EST_PREMIUM) + _HEADER


def select_codec(
    flat: np.ndarray,
    stats: ChunkStats,
    forced: str | None = None,
    allow_dict: bool = True,
    dict_page_limit: int | None = None,
    wide: bool = False,
) -> Decision:
    """Pick the minimum-estimated-size codec; R3 escape hatch to plain."""
    if forced is not None:
        if forced == "fsst":
            est = _fsst_trial_bytes(flat, stats)
        elif forced == "bss":
            # no analytical estimate for byte-plane transpose (its payoff is
            # in the outer layer); plain-size is the honest body size
            est = estimate_bytes(stats, "plain", wide)
        else:
            est = estimate_bytes(stats, forced, wide)
        return Decision(forced, est, "forced", "suggestion")
    cands = candidate_codecs(stats, allow_dict, dict_page_limit, allow_fsst=not wide)
    ests = {}
    for c in cands:
        ests[c] = _fsst_trial_bytes(flat, stats) if c == "fsst" else estimate_bytes(stats, c, wide)
    best = min(ests, key=lambda c: (ests[c], c))
    plain_est = ests["plain"]
    # R3: if the winner saves <5% vs plain, store plain (decode speed wins)
    if best != "plain" and ests[best] > LOW_RATIO * plain_est:
        return Decision("plain", plain_est, "low-compression-ratio", "suggestion", ests)
    rule = {
        "dict": "dictionary-encoding-cardinality",
        "delta": "timestamp-delta-encoding",
        "for": "frame-of-reference",
        "rle": "run-length",
        "fsst": "fsst-symbol-table",
        "plain": "low-compression-ratio",
    }[best]
    return Decision(best, ests[best], rule, "suggestion", ests)


# R4 gate (reference rules/float_encoding.rs:17-90): high-cardinality float
# streams go BYTE_STREAM_SPLIT; low-cardinality ones fall back to the int
# machinery on their bit patterns (dict/rle win there)
FLOAT_BSS_RATIO = 0.1


def select_float_codec(
    view: np.ndarray,
    stats: ChunkStats,
    forced: str | None = None,
    wide: bool = False,
    allow_dict: bool = True,
    dict_page_limit: int | None = None,
) -> Decision:
    """R4 realized: BSS for distinct-ratio ≥ 0.1 float streams, else the
    standard selector over the bit-pattern view (a float column with few
    distinct values is a dictionary column wearing an IEEE costume).
    `allow_dict`/`dict_page_limit` thread the user's dictionary directives
    through — a hardcoded allow_dict=True silently ignored `dictionary
    false` on float columns."""
    if forced is not None:
        # plain-size stands in for codecs with no analytical estimate (a 0
        # would misfile every forced column as a >50%-saving 'warning' in
        # the lint severity math)
        est = (
            estimate_bytes(stats, forced, wide)
            if forced in ("plain", "for", "delta", "rle", "dict")
            else estimate_bytes(stats, "plain", wide)
        )
        return Decision(forced, est, "forced", "suggestion")
    if stats.cardinality_ratio >= FLOAT_BSS_RATIO:
        return Decision("bss", estimate_bytes(stats, "plain", wide), "float-byte-stream-split", "suggestion")
    return select_codec(
        view, stats, allow_dict=allow_dict, dict_page_limit=dict_page_limit, wide=wide
    )
