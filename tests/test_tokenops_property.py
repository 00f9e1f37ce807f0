"""Property tests for the token-level corpus operators: random small
corpora checked against an independent pure-Python reference model
(set/dict arithmetic over explicit n-gram tuples — no md5, no Spark
expressions shared with the implementation under test)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st


def _ref_spans(tokens, n, stride):
    """Reference span model: the set of length-n token tuples at offsets
    0, stride, 2*stride, ... (0-based twin of the 1-based Spark expr)."""
    if tokens is None or len(tokens) < n:
        return set()
    return {tuple(tokens[i : i + n]) for i in range(0, len(tokens) - n + 1, stride)}


def _mk_docs(draw_lists):
    return [(f"d{i}", toks) for i, toks in enumerate(draw_lists)]


corpus = st.lists(
    st.lists(st.integers(0, 9), min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)


@settings(max_examples=12, deadline=None)
@given(corpus=corpus, n=st.integers(2, 5), stride=st.integers(1, 3))
def test_span_dedup_matches_reference(spark, corpus, n, stride):
    from tokenlake import tokenops

    docs = _mk_docs(corpus)
    df = spark.createDataFrame(
        [(d, t, len(t), "w") for d, t in docs],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["dup_spans"])
        for r in tokenops.span_dedup(df, n=n, stride=stride).collect()
    }
    spans = {d: _ref_spans(t, n, stride) for d, t in docs}
    for d, s in spans.items():
        dup = sum(1 for sp in s if any(sp in spans[o] for o in spans if o != d))
        assert got[d] == (len(s), dup), (d, n, stride, corpus)


@settings(max_examples=12, deadline=None)
@given(corpus=corpus, ev_toks=st.lists(st.integers(0, 9), min_size=0, max_size=12),
       n=st.integers(2, 5))
def test_contamination_matches_reference(spark, corpus, ev_toks, n):
    from tokenlake import tokenops

    docs = _mk_docs(corpus)
    df = spark.createDataFrame(
        [(d, t, len(t), "w") for d, t in docs],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    ev = spark.createDataFrame(
        [("e0", ev_toks, len(ev_toks), "eval")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["eval_hits"], r["contaminated"])
        for r in tokenops.contamination(df, ev, n=n).collect()
    }
    ev_spans = _ref_spans(ev_toks, n, 1)
    for d, t in docs:
        s = _ref_spans(t, n, 1)
        hits = len(s & ev_spans)
        assert got[d] == (len(s), hits, hits > 0), (d, n, corpus, ev_toks)


@settings(max_examples=10, deadline=None)
@given(corpus=corpus)
def test_vocab_histogram_matches_reference(spark, corpus):
    from collections import Counter

    from tokenlake import tokenops

    docs = _mk_docs(corpus)
    df = spark.createDataFrame(
        [(d, t, len(t), "w") for d, t in docs],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    got = {
        r["token"]: (r["freq"], r["n_docs"])
        for r in tokenops.vocab_histogram(df).collect()
    }
    freq = Counter(tok for _, t in docs for tok in t)
    ndocs = Counter()
    for _, t in docs:
        for tok in set(t):
            ndocs[tok] += 1
    assert got == {tok: (c, ndocs[tok]) for tok, c in freq.items()}


@settings(max_examples=12, deadline=None)
@given(corpus=corpus, n=st.integers(2, 4), w=st.integers(2, 4))
def test_winnow_keys_match_exact_reference(spark, corpus, n, w):
    """winnow_keys pinned EXACTLY (not just the winnowing theorem):
    a pure-Python replay of the same md5-of-joined-decimal-span hashing
    and per-window minima must produce the identical fingerprint set,
    including the short-doc full-span fallback."""
    import hashlib

    from pyspark.sql import functions as F

    from tokenlake import tokenops

    def ref_fps(tokens):
        spans = [
            hashlib.md5(" ".join(map(str, tokens[i : i + n])).encode()).hexdigest()
            for i in range(0, len(tokens) - n + 1)
        ]
        if len(spans) >= w:
            return {min(spans[i : i + w]) for i in range(0, len(spans) - w + 1)}
        return set(spans)

    docs = _mk_docs(corpus)
    df = spark.createDataFrame(
        [(d, t, len(t), "w") for d, t in docs],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    got = {
        r["doc_id"]: set(r["fps"])
        for r in df.select(
            "doc_id", tokenops.winnow_keys("tokens", n, w).alias("fps")
        ).collect()
    }
    for d, t in docs:
        assert got[d] == ref_fps(t), (d, n, w, t)
