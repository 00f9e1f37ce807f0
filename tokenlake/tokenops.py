"""Token-array corpus operators over the canonical sequences table
(doc_id string, tokens array<int32>, n_tok int32, source string) — the
pre-tokenized input shape this engine encodes.

These complete the training-data-pipeline set at the TOKEN level (textops
covers the raw-text level): vocabulary statistics, exact duplicated-span
detection, winnowed fingerprinting, Gopher-style repetition signals,
train/eval decontamination, and the curate_sequences funnel composing
them into keep/drop verdicts. All pure JVM column expressions (explode →
hash aggregate with map-side partial aggregation, equi-joins on uniform
md5 span keys); no Python in any hot path.

Design notes for 100 TB / 10^12 sequences:
- `vocab_histogram`: explode feeds a hash aggregate in the SAME stage, so
  the shuffle carries O(vocab × partitions) partial rows, never O(total
  tokens). Document frequency adds one distinct pass on (token, doc_id) —
  both keys uniform, no skew.
- `span_dedup` / `span_groups`: exact duplicated-token-span detection in
  the spirit of suffix-array ExactSubstr dedup (Lee et al., "Deduplicating
  Training Data Makes Language Models Better", ACL 2022), reformulated
  shuffle-friendly: fixed-length n-gram spans hashed to md5 keys at a
  configurable stride, then grouped / semi-joined on the span key. The
  exploded+shuffled payload is one 128-bit key per (doc, position/stride)
  — bounded data amplification of ~16/stride bytes per token position —
  and every join is an equi-join on a uniform hash key: no all-pairs work,
  no skewed reducers. A stride of n gives non-overlapping span tiling
  (cheapest); stride 1 gives the exact every-offset semantics.
- `contamination`: the standard eval-set n-gram decontamination check as a
  broadcast LEFT SEMI join against the distinct eval span set (eval sets
  are small — benchmarks, not corpora); flip broadcast_eval=False to let
  AQE pick a shuffle join when the eval side is itself corpus-sized.
- Skew: a boilerplate span shared by MOST docs (license headers, prompt
  templates) is the realistic hot key. Every aggregate here is map-side
  partial (the reducer sees O(partitions) rows per span, not O(docs)),
  so the only skew point is the hot-span semi-join's probe-side shuffle —
  exactly the shape AQE skew-join splitting handles (enabled in
  session.py); correctness under a corpus-wide span is test-pinned.

Reference parity: parquet-linter has no token-level operators (it lints
Parquet metadata); these extend the engine's §2 coverage the same way the
textops/dedup family does, per the build brief's training-data mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def span_keys(col: str = "tokens", n: int = 4, stride: int = 1) -> Column:
    """md5 keys of every length-`n` token span at offsets 1, 1+stride, …

    Short (or null) token arrays yield an EMPTY list — Spark's
    sequence(1, 0) counts DOWN (unlike DuckDB's generate_series), so the
    short-doc case is branched explicitly, mirroring textops.shingles.
    The key is the md5 of the space-joined decimal tokens: deterministic,
    uniform (no hot reducers), and replayable in ANSI SQL for the oracle.

    Precondition: token ELEMENTS are non-null (the canonical sequences
    contract — null-ness lives at the array level). concat_ws skips null
    elements, so a null-holding span would alias the shorter span's key;
    scrub element nulls upstream before spanning a non-canonical table.
    """
    t = F.col(col)
    last = F.size(t) - (n - 1)
    idx = F.when(last >= 1, F.sequence(F.lit(1), last, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.md5(F.concat_ws(" ", F.slice(t, i, n).cast("array<string>"))),
    )


def winnow_keys(col: str = "tokens", n: int = 4, w: int = 4) -> Column:
    """Winnowed span fingerprints (Schleimer, Wilkerson & Aiken, "Winnowing:
    Local Algorithms for Document Fingerprinting", SIGMOD 2003): the
    distinct set of per-window minima over the length-`n` span hashes,
    window size `w`.

    Guarantee (the winnowing theorem): two docs sharing a token run of
    length ≥ n + w - 1 share at least one fingerprint REGARDLESS of the
    run's offset in either doc — the alignment robustness a fixed stride
    can't give — while keeping ~2/(w+1) of the per-position keys. The
    minimum of a window of uniform md5 hashes is content-defined, so both
    docs pick the same anchor inside the shared run.

    Docs shorter than n + w - 1 fall back to their full span-hash set
    (still correct, just un-thinned) so short docs keep dedup coverage.
    """
    hashes = span_keys(col, n, stride=1)
    n_win = F.size(hashes) - (w - 1)
    widx = F.when(n_win >= 1, F.sequence(F.lit(1), n_win)).otherwise(
        F.array().cast("array<int>")
    )
    minima = F.transform(widx, lambda i: F.array_min(F.slice(hashes, i, w)))
    return F.array_distinct(F.when(n_win >= 1, minima).otherwise(hashes))


def winnow_dedup(seqs: DataFrame, n: int = 4, w: int = 4) -> DataFrame:
    """Per-doc duplication profile over winnowed fingerprints: same output
    shape as span_dedup (n_spans/dup_spans/dup_frac count FINGERPRINTS),
    but alignment-robust at ~2/(w+1) the key volume — the scale-preferred
    variant when shared regions are long (boilerplate, template text).
    The shuffle story is identical: distinct (doc, fingerprint) rows,
    hash aggregates and a semi-join on uniform md5 keys.
    """
    sp = seqs.select(
        "doc_id", "source", F.explode(winnow_keys("tokens", n, w)).alias("span")
    ).dropDuplicates(["doc_id", "span"])
    return _dup_profile(seqs, sp)


def vocab_histogram(seqs: DataFrame) -> DataFrame:
    """Corpus vocabulary statistics: per token value, total occurrences
    (`freq`) and document frequency (`n_docs`).

    The building block for vocab coverage checks, BPE merge audits, and
    frequency-based filtering over a tokenized corpus.
    """
    tok = seqs.select(F.col("doc_id"), F.explode("tokens").alias("token"))
    return tok.groupBy(F.col("token").cast("long").alias("token")).agg(
        F.count("*").cast("long").alias("freq"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )


def sequence_quality(seqs: DataFrame) -> DataFrame:
    """Gopher-style repetition/quality signals at the TOKEN level (the
    MassiveText repetition filters of Rae et al. 2021, Appendix A,
    re-expressed over token arrays): per doc, the integer counts behind
    the standard within-doc repetition ratios —

      n_tok, distinct_tokens        → type/token ratio
      top_token_count               → top-token fraction (mode frequency)
      n_bigrams, distinct_bigrams   → duplicate-bigram fraction

    plus the derived ratios for direct filtering. Everything is a per-row
    column expression (sort_array + a single aggregate() fold computes the
    mode frequency run-length over the sorted array) — shuffle-free, scans
    only the tokens column, and the integer counts make oracle compares
    float-free. Null/empty token arrays yield zero counts.
    """
    t = F.coalesce(F.col("tokens"), F.array().cast("array<int>"))
    n_tok = F.size(t).cast("long")
    distinct_tokens = F.size(F.array_distinct(t)).cast("long")
    s = F.sort_array(t)
    run_state = F.named_struct(
        F.lit("prev"), F.lit(None).cast("int"),
        F.lit("cur"), F.lit(0).cast("long"),
        F.lit("best"), F.lit(0).cast("long"),
    )
    top_token_count = F.aggregate(
        s,
        run_state,
        lambda acc, x: F.named_struct(
            F.lit("prev"), x,
            F.lit("cur"),
            F.when(acc["prev"].isNotNull() & (x == acc["prev"]), acc["cur"] + 1).otherwise(
                F.lit(1).cast("long")
            ),
            F.lit("best"),
            F.greatest(
                acc["best"],
                F.when(acc["prev"].isNotNull() & (x == acc["prev"]), acc["cur"] + 1).otherwise(
                    F.lit(1).cast("long")
                ),
            ),
        ),
        lambda acc: acc["best"],
    )
    bg_idx = F.when(n_tok >= 2, F.sequence(F.lit(1), (n_tok - 1).cast("int"))).otherwise(
        F.array().cast("array<int>")
    )
    bigrams = F.transform(
        bg_idx, lambda i: F.concat_ws(" ", F.slice(t, i, 2).cast("array<string>"))
    )
    n_bigrams = F.size(bigrams).cast("long")
    distinct_bigrams = F.size(F.array_distinct(bigrams)).cast("long")
    denom = F.greatest(n_tok, F.lit(1)).cast("double")
    bg_denom = F.greatest(n_bigrams, F.lit(1)).cast("double")
    return seqs.select(
        "doc_id",
        "source",
        n_tok.alias("n_tok"),
        distinct_tokens.alias("distinct_tokens"),
        top_token_count.alias("top_token_count"),
        n_bigrams.alias("n_bigrams"),
        distinct_bigrams.alias("distinct_bigrams"),
        F.round(distinct_tokens / denom, 4).alias("type_token_ratio"),
        F.round(top_token_count / denom, 4).alias("top_token_frac"),
        F.round((n_bigrams - distinct_bigrams) / bg_denom, 4).alias("dup_bigram_frac"),
    )


def _doc_spans(seqs: DataFrame, n: int, stride: int) -> DataFrame:
    """Distinct (doc_id, source, span-key) rows; one shuffle on the
    composite key. Distinctness makes downstream counts span-set semantics
    (a doc repeating its own span internally is not a cross-doc dup)."""
    return seqs.select(
        "doc_id",
        "source",
        F.explode(span_keys("tokens", n, stride)).alias("span"),
    ).dropDuplicates(["doc_id", "span"])


def span_groups(seqs: DataFrame, n: int = 4, stride: int = 1) -> DataFrame:
    """Duplicated-span groups: spans occurring in ≥2 distinct docs, with
    the doc count and the group's min/max doc_id (lexicographic on the
    caller's doc_id type)."""
    sp = _doc_spans(seqs, n, stride)
    return (
        sp.groupBy("span")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def span_dedup(seqs: DataFrame, n: int = 4, stride: int = 1) -> DataFrame:
    """ExactSubstr-style per-document duplication profile: for each doc,
    how many of its distinct length-`n` spans also occur in another doc
    (`dup_spans`), out of `n_spans`; `dup_frac` is the filterable signal
    (Lee et al. 2022 drop or trim docs past a duplication threshold).

    Docs too short to form a span are kept with zero counts — a curation
    pipeline must see every input row to decide its fate.
    """
    return _dup_profile(seqs, _doc_spans(seqs, n, stride))


def _dup_profile(seqs: DataFrame, sp: DataFrame) -> DataFrame:
    """(doc, key) rows → per-doc duplication profile: n_spans, dup_spans
    (keys occurring in ≥2 docs), dup_frac. Every doc of `seqs` appears in
    the output (key-less docs with zeros)."""
    hot = (
        sp.groupBy("span")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("span")
    )
    per_doc = sp.join(hot, "span", "left_semi").groupBy("doc_id").agg(
        F.count("*").alias("dup_spans")
    )
    base = sp.groupBy("doc_id").agg(F.count("*").alias("n_spans"))
    all_docs = seqs.select("doc_id", "source").dropDuplicates(["doc_id"])
    n_spans = F.coalesce(F.col("n_spans"), F.lit(0)).cast("long")
    dup_spans = F.coalesce(F.col("dup_spans"), F.lit(0)).cast("long")
    return (
        all_docs.join(base, "doc_id", "left")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            n_spans.alias("n_spans"),
            dup_spans.alias("dup_spans"),
            F.round(
                dup_spans / F.greatest(n_spans, F.lit(1)).cast("double"), 4
            ).alias("dup_frac"),
        )
    )


def curate_sequences(
    train: DataFrame,
    eval_seqs: DataFrame,
    n: int = 4,
    stride: int = 1,
    max_dup_frac: float = 0.5,
    broadcast_eval: bool = True,
    winnow: int | None = None,
    max_dup_bigram_frac: float | None = None,
) -> DataFrame:
    """Token-level curation funnel: per train doc, a keep/drop verdict
    composing the span-duplication profile and the eval-contamination
    check — the sequences-side twin of textops.curate_corpus.

    Drop precedence mirrors a production pipeline: contamination first
    (an eval-tainted doc is dropped regardless of duplication), then
    heavy duplication (`dup_spans > n_spans × max_dup_frac`, Lee et al.'s
    document-level filter). Docs too short to form spans pass both gates.
    Output: one row per train doc with the profile columns, `drop_reason`
    ('contaminated' | 'duplicated' | null) and the boolean `keep`.

    `winnow=w` switches the DUPLICATION profile to winnowed fingerprints
    (alignment-robust, ~2/(w+1) the keys — the scale default for long
    shared regions); the CONTAMINATION gate stays exact-span regardless,
    since decontamination must catch a single shared eval n-gram and
    winnowing guarantees overlap only past n+w-1 tokens.

    `max_dup_bigram_frac` adds the Gopher repetition gate AHEAD of both
    (the production ordering: the per-row filter is the cheapest, so it
    fires first): drop_reason 'repetitive' when a doc's duplicate-bigram
    count exceeds n_bigrams × the threshold (sequence_quality's signal).
    """
    prof = (
        winnow_dedup(train, n, winnow) if winnow else span_dedup(train, n, stride)
    )
    # stride applies to the DEDUP profile only: contamination at stride > 1
    # probes aligned offsets on both sides and silently misses most eval
    # n-gram overlaps (its own docstring forbids it as an eval-leak gate),
    # so the gate is pinned to stride=1 — exactly what this docstring
    # promises ("the CONTAMINATION gate stays exact-span regardless")
    cont = contamination(train, eval_seqs, n, 1, broadcast_eval).select(
        "doc_id", "eval_hits", "contaminated"
    )
    meta = train.select("doc_id", F.col("n_tok").cast("long").alias("n_tok")).dropDuplicates(
        ["doc_id"]
    )
    dup_heavy = F.col("dup_spans") > F.col("n_spans") * F.lit(float(max_dup_frac))
    joined = prof.join(cont, "doc_id").join(meta, "doc_id")
    if max_dup_bigram_frac is not None:
        q = sequence_quality(train).select(
            "doc_id",
            (
                (F.col("n_bigrams") - F.col("distinct_bigrams"))
                > F.col("n_bigrams") * F.lit(float(max_dup_bigram_frac))
            ).alias("_repetitive"),
        )
        joined = joined.join(q, "doc_id")
    else:
        joined = joined.withColumn("_repetitive", F.lit(False))
    drop_reason = (
        F.when(F.col("_repetitive"), F.lit("repetitive"))
        .when(F.col("contaminated"), F.lit("contaminated"))
        .when(dup_heavy, F.lit("duplicated"))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        joined
        .select(
            "doc_id",
            "source",
            "n_tok",
            "n_spans",
            "dup_spans",
            "eval_hits",
            "contaminated",
            drop_reason.alias("drop_reason"),
            drop_reason.isNull().alias("keep"),
        )
    )


def contamination(
    train: DataFrame,
    eval_seqs: DataFrame,
    n: int = 4,
    stride: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Train/eval n-gram decontamination: per train doc, how many of its
    distinct spans appear anywhere in the eval set (`eval_hits`), plus the
    boolean `contaminated` flag a filter stage consumes.

    The eval span set is distinct-ed then (by default) broadcast — eval
    suites are tiny next to the corpus, so the corpus-side scan never
    shuffles its span rows for the probe.

    Keep stride=1 for decontamination: a larger stride probes only
    aligned offsets on BOTH sides, so a shared n-gram at a non-aligned
    offset would be missed — acceptable for dedup sampling, not for an
    eval-leak gate.
    """
    ev = eval_seqs.select(
        F.explode(span_keys("tokens", n, stride)).alias("span")
    ).dropDuplicates(["span"])
    if broadcast_eval:
        ev = F.broadcast(ev)
    sp = _doc_spans(train, n, stride)
    hits = sp.join(ev, "span", "left_semi").groupBy("doc_id").agg(
        F.count("*").alias("eval_hits")
    )
    base = sp.groupBy("doc_id").agg(F.count("*").alias("n_spans"))
    all_docs = train.select("doc_id", "source").dropDuplicates(["doc_id"])
    n_spans = F.coalesce(F.col("n_spans"), F.lit(0)).cast("long")
    eval_hits = F.coalesce(F.col("eval_hits"), F.lit(0)).cast("long")
    return (
        all_docs.join(base, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            n_spans.alias("n_spans"),
            eval_hits.alias("eval_hits"),
            (eval_hits > 0).alias("contaminated"),
        )
    )
