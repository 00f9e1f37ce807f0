"""Training-data text operators over the `documents` table — all built-in
pyspark.sql.functions (JVM-side, codegen'd); no Python in the hot path.

These extend the reference's capability set with the operations a large-scale
training-data pipeline needs (dedup, quality, language-ID, fingerprinting).
Design notes for 100 TB:
- every operator is a pure column expression or a groupBy over a hash key →
  map-side partial aggregation, no skew (md5 keys are uniform);
- the LSH path (minhash → band bucket → in-bucket join) turns the O(n²)
  near-dup problem into an equi-join on bucket keys — the standard
  shuffle-friendly formulation;
- n-gram Jaccard verification joins only within candidate buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

WORD_SPLIT_RE = "[^a-z0-9]+"

# tiny per-language stopword marker sets for the language-ID heuristic
# the two languages the prediction (and its DuckDB oracle) actually
# compare; a dead "zh" entry used to ship markers the pred could never
# emit — and its pinyin "de" collided with the es marker set
LANG_MARKERS = {
    "en": ["the", "and", "of", "a"],
    "es": ["el", "la", "los", "de"],
}


def words(col: str = "text") -> Column:
    """Lowercased word array, empty strings dropped."""
    return F.filter(F.split(F.lower(F.col(col)), WORD_SPLIT_RE), lambda w: w != "")


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace/punct token counting (BPE-ish regex split)."""
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(words()).cast("long").alias("n_words"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features."""
    w = words()
    stop = F.array([F.lit(s) for s in ["the", "a", "of", "and", "to", "in"]])
    n_words = F.size(w)
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length("text").cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        F.round(
            F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", "")) / F.greatest(F.length("text"), F.lit(1)),
            4,
        ).alias("alpha_ratio"),
        F.round(
            F.size(F.filter(w, lambda x: F.array_contains(stop, x))) / F.greatest(n_words, F.lit(1)),
            4,
        ).alias("stopword_ratio"),
        F.round(
            (F.length("text") - F.length(F.regexp_replace(F.col("text"), " ", ""))) / F.greatest(F.length("text"), F.lit(1)),
            4,
        ).alias("space_ratio"),
    )


def langid(docs: DataFrame) -> DataFrame:
    """Marker-word language-ID heuristic vs the labeled `lang` column."""
    w = words()
    scores = []
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array([F.lit(m) for m in markers])
        scores.append(
            F.size(F.filter(w, lambda x: F.array_contains(marker_arr, x))).alias(f"score_{lang}")
        )
    scored = docs.select(F.col("doc_id").cast("long").alias("doc_id"), F.col("lang"), *scores)
    pred = (
        F.when(
            (F.col("score_en") >= F.col("score_es")) & (F.col("score_en") > 0), F.lit("en")
        )
        .when(F.col("score_es") > 0, F.lit("es"))
        .otherwise(F.lit("unk"))
    )
    return scored.select("doc_id", "lang", pred.alias("predicted"))


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text."""
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), "\\s+", " ")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.md5(norm).alias("fp")
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup: hash-groupBy on content; keeper = min doc_id per group."""
    return (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), F.md5("text").alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").cast("long").alias("dup_count"),
        )
    )


def shingles(col: str = "text", k: int = 3) -> Column:
    """Word k-gram shingles (1-based transform — matches DuckDB list semantics).

    Documents with fewer than k words yield an EMPTY shingle list: Spark's
    sequence(1, 0) counts DOWN to [1, 0] (unlike DuckDB's generate_series,
    which is empty), so the short-doc case must be branched explicitly or the
    transform indexes past the words array and the whole query crashes."""
    w = words(col)
    n = F.size(w) - (k - 1)
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, (i + j).cast("int")) for j in range(k)]
        ),
    )


def minhash_signatures(docs: DataFrame, n_hashes: int = 4) -> DataFrame:
    """MinHash over word-3-gram shingles: mh_i = min(md5(i || shingle)).

    min over md5 strings ≡ min over a uniform permutation of the shingle
    space — the textbook string-minhash; seeds are prefix salts.
    """
    sh = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(F.array_distinct(shingles())).alias("sh"),
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(str(i)), F.col("sh")))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_buckets(docs: DataFrame, n_hashes: int = 4) -> DataFrame:
    """Multi-band LSH candidates: docs sharing ANY of the `n_hashes` one-row
    bands are near-dup candidates.

    Recall math (r=1 row per band, b=n_hashes bands): a pair with shingle
    Jaccard s collides on a given band w.p. s, so
    P(candidate) = 1 - (1-s)^b — e.g. s=0.5 → 0.94 at b=4 vs 0.50 for the
    single-band `lsh_buckets`. Cost is b shuffled rows per doc (still linear;
    the per-(band,bucket) `n_docs > 1` filter keeps the downstream pair join
    bounded by real collisions, as in the single-band path)."""
    sig = minhash_signatures(docs, n_hashes)
    tall = sig.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"mh{i}") for i in range(n_hashes)])).alias(
            "band", "bucket"
        ),
    )
    return (
        tall.groupBy("band", "bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


def lsh_buckets(docs: DataFrame, band: int = 0) -> DataFrame:
    """LSH banding: docs sharing a minhash band are near-dup candidates.

    Single-band form (kept as the SQL-oracled query surface); use
    `lsh_candidate_buckets` for the multi-band recall curve."""
    sig = minhash_signatures(docs)
    return (
        sig.groupBy(F.col(f"mh{band}").alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard for near-dup pairs, verified within LSH buckets.

    At scale the candidate set (same mh0 bucket) is tiny relative to n², so
    the shingle self-join only touches candidate docs.
    """
    # only mh0 is consumed as the bucket key: computing the other three
    # aggregations over the exploded shingle set (the job's largest
    # intermediate) was pure waste
    sig = minhash_signatures(docs, n_hashes=1).select("doc_id", F.col("mh0").alias("bucket"))
    cand = sig.join(
        sig.groupBy("bucket").count().filter(F.col("count") > 1).select("bucket"),
        "bucket",
    ).select(F.col("doc_id").alias("cand_id"))
    sh = (
        docs.join(cand, docs.doc_id.cast("long") == cand.cand_id)
        # no .distinct(): cand ids are distinct groupBy output and
        # explode(array_distinct(...)) is per-doc unique already — the
        # extra full shuffle deduplicated nothing
        .select(F.col("cand_id").alias("doc_id"), F.explode(F.array_distinct(shingles())).alias("sh"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def split_assign(docs: DataFrame, train: float = 0.9, val: float = 0.05) -> DataFrame:
    """Deterministic train/val/test split assignment — the standard
    hash-bucket split a training pipeline needs to be reproducible across
    engines and reruns: bucket = first 8 hex digits of md5(doc_id) mod 100
    (md5 is portable; xxhash64 is not). Pure column expressions, no shuffle."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
        % 100
    )
    # round, not int(): float truncation shifted boundaries for many
    # fractions (int(0.57*100) == 56), silently relabeling split buckets
    # in a reproducibility-critical assigner
    t, v = round(train * 100), round((train + val) * 100)
    split = (
        F.when(bucket < t, F.lit("train"))
        .when(bucket < v, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        bucket.alias("bucket"),
        split.alias("split"),
    )


def pack_sequences(
    docs: DataFrame, window: int = 4096, bucket_rows: int = 64 * 1024
) -> DataFrame:
    """Streaming sequence packing: assign docs to fixed-size context windows
    per source, in doc_id order — pack_id = which window the doc's starting
    character offset falls in (cumulative length // window).

    Distributed prefix sum, two levels (the chunk planner's offset trick,
    chunking.py): the naive `Window.partitionBy(source)` formulation puts
    EVERY row of a source on one reducer — a 60%-hot crawl source at corpus
    scale serializes most of the data through a single task. Instead each
    source is split into order-aligned doc_id-range buckets (~`bucket_rows`
    rows each), the cumulative sum runs per (source, bucket) in parallel,
    and one tiny per-bucket aggregate supplies each bucket's base offset.
    The output is invariant to the bucketing (buckets only decompose the
    sum), so this is plan shape only — same rows, same values.

    Bucket boundaries derive from per-source (min, max, rows): the range
    map is monotone in doc_id (double arithmetic — monotone ops under
    monotone rounding stay monotone), so every row of bucket k precedes
    every row of bucket k+1 in doc_id order, which is exactly what the
    exclusive-prefix decomposition needs. Null doc_ids sort first in the
    old window order and are pinned to bucket 0 here.

    Returns (doc_id, source, n_chars, pack_id, pack_pos)."""
    from pyspark.sql import Window

    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    stats = base.groupBy("source").agg(
        F.min("doc_id").alias("_mn"),
        F.max("doc_id").alias("_mx"),
        F.count("*").alias("_rows"),
    ).select(
        "source",
        F.col("_mn").cast("double").alias("_mnd"),
        F.col("_mx").cast("double").alias("_mxd"),
        F.greatest(F.ceil(F.col("_rows") / F.lit(bucket_rows)), F.lit(1))
        .cast("long")
        .alias("_nb"),
    )
    span = F.col("_mxd") - F.col("_mnd") + F.lit(1.0)
    bkt = F.floor(
        (F.col("doc_id").cast("double") - F.col("_mnd")) / span * F.col("_nb")
    )
    # clamp: float rounding at the top edge can emit _nb; nulls sort first
    bkt = F.least(F.greatest(bkt, F.lit(0)), F.col("_nb") - 1)
    b = (
        base.join(F.broadcast(stats), "source")
        .withColumn("_bkt", F.coalesce(bkt, F.lit(0)).cast("long"))
        .drop("_mnd", "_mxd", "_nb")
    )
    w_local = Window.partitionBy("source", "_bkt").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    local_cum = F.sum("n_chars").over(w_local)
    # per-bucket totals → exclusive prefix per source: O(#buckets) rows, the
    # only cross-bucket communication
    tot = b.groupBy("source", "_bkt").agg(F.sum("n_chars").alias("_btot"))
    w_b = Window.partitionBy("source").orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = tot.select(
        "source", "_bkt", F.coalesce(F.sum("_btot").over(w_b), F.lit(0)).alias("_base")
    )
    cum = F.col("_base") + local_cum
    pack = F.floor((cum - F.col("n_chars")) / F.lit(window)).cast("long")
    packed = (
        b.join(F.broadcast(offs), ["source", "_bkt"])
        .select(
            "doc_id",
            "source",
            "n_chars",
            pack.alias("pack_id"),
        )
    )
    pos_w = Window.partitionBy("source", "pack_id").orderBy("doc_id")
    return packed.withColumn("pack_pos", F.row_number().over(pos_w).cast("long"))


def simhash64(docs: DataFrame) -> DataFrame:
    """64-bit SimHash over words: majority vote per bit of word-hash bits.

    Uses xxhash64 (Spark built-in) — no portable SQL oracle, so the driver
    records this one rows-only. All 64 bits are real (round 1 computed only
    16); bit 63 rides the sign bit via shiftleft/bitwiseOR, so the result
    spans the full signed-long range.
    """
    w = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.explode(words()).alias("w")
    ).withColumn("h", F.xxhash64("w"))
    one = F.lit(1).cast("long")
    bits = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.shiftleft(one, i)) != 0, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = w.groupBy("doc_id").agg(*bits)
    sim = F.lit(0).cast("long")
    for i in range(64):
        sim = sim.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.shiftleft(one, i)).otherwise(F.lit(0).cast("long"))
        )
    return agg.select("doc_id", sim.alias("simhash"))


def simhash_band(col: Column, band: int, band_bits: int = 32) -> Column:
    """One Hamming band of a simhash: bits [band*band_bits, (band+1)*band_bits)."""
    return F.shiftrightunsigned(col, band * band_bits).bitwiseAND(
        F.lit((1 << band_bits) - 1).cast("long")
    )


def simhash_candidates(
    docs: DataFrame, band_bits: int = 32, max_bucket: int = 10_000
) -> DataFrame:
    """SimHash near-dup candidate pairs: docs agreeing on ANY band of their
    64-bit simhash (Hamming-distance blocking: a pair within Hamming distance
    64/band_bits − 1 must agree on at least one band — pigeonhole).
    Equi-join on (band, band_value); no cartesian.

    Corpus-scale collision math drives the defaults: UNRELATED docs collide
    on one band at rate 2^-band_bits, so each band contributes ~n²/2^band_bits
    random candidate pairs. At n=10^9: 16-bit bands ⇒ ~1.5×10^13 junk pairs
    (ruinous); 32-bit bands ⇒ ~2×10^8 (fine). Hence band_bits=32 (2 bands,
    guaranteed recall only for Hamming ≤1; near-dup texts typically differ by
    0-2 bits, and the Jaccard verify stage re-checks every candidate anyway).
    `max_bucket` is the hot-bucket guard (same role as the MinHash path's
    bucket filter): any (band, value) bucket holding more than `max_bucket`
    docs — degenerate content such as empty/boilerplate text — is dropped
    before the self-join rather than producing O(bucket²) pairs.
    """
    n_bands = 64 // band_bits
    sh = simhash64(docs)
    bands = F.array(
        *[
            F.struct(F.lit(b).alias("band"), simhash_band(F.col("simhash"), b, band_bits).alias("bv"))
            for b in range(n_bands)
        ]
    )
    sig = sh.select("doc_id", F.explode(bands).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bv").alias("bv")
    )
    # hot-bucket guard: one count aggregate, broadcast back as an anti-filter
    counts = sig.groupBy("band", "bv").agg(F.count("*").alias("n_in_bucket"))
    sig = (
        sig.join(counts, ["band", "bv"])
        .filter((F.col("n_in_bucket") > 1) & (F.col("n_in_bucket") <= max_bucket))
        .drop("n_in_bucket")
    )
    a = sig.select(F.col("doc_id").alias("doc_a"), "band", "bv")
    b = sig.select(F.col("doc_id").alias("doc_b"), "band", "bv")
    return (
        a.join(b, ["band", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def dedup_text_clusters(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Connected components over the Jaccard-verified text near-dup graph
    (ngram_jaccard_pairs): cluster = smallest doc_id reachable, so
    keep-one-per-cluster is `filter(doc_id == cluster)` — the text twin of
    similarity.dedup_components, sharing its min-label propagation engine
    (one equi-join + groupBy-min per iteration, O(diameter) rounds)."""
    from .similarity import min_label_components

    pairs = ngram_jaccard_pairs(docs, threshold)
    ids = docs.select(F.col("doc_id").cast("long").alias("x"))
    return min_label_components(
        pairs.select(F.col("doc_a").alias("x"), F.col("doc_b").alias("y")), ids
    )


def curate_corpus(docs: DataFrame, jaccard_threshold: float = 0.5) -> DataFrame:
    """End-to-end corpus curation funnel — the composition a training-data
    pipeline actually runs, each stage the operator this module already
    ships, applied in sequence so later (costlier) stages see only
    survivors:

      1. quality gate: ≥5 words AND alpha_ratio ≥ 0.5 (quality_scores'
         features, fixed thresholds)
      2. exact dedup: keep doc_id == min per md5(text) among survivors
      3. near-dup dedup: Jaccard clusters over the remaining docs
         (ngram_jaccard_pairs → min_label_components); keep the cluster
         representative (min doc_id)

    Returns the per-source accounting (n_docs, dropped_quality,
    dropped_exact, dropped_neardup, kept) — deterministic, fully
    SQL-replayable (each stage has a DuckDB twin), and shuffle-frugal:
    the funnel's joins are all on doc_id/content-hash equi-keys and the
    expensive pair join runs over the post-dedup minority."""
    from .similarity import min_label_components

    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "source"
    )
    q = quality_scores(docs).select("doc_id", "n_words", "alpha_ratio")
    staged = base.join(q, "doc_id").withColumn(
        "pass_quality", (F.col("n_words") >= 5) & (F.col("alpha_ratio") >= 0.5)
    )
    surv1 = staged.filter("pass_quality").select("doc_id", "text", "source")
    keep2 = (
        surv1.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    surv2 = surv1.join(keep2, "doc_id", "left_semi")
    pairs = ngram_jaccard_pairs(surv2, jaccard_threshold)
    comps = min_label_components(
        pairs.select(F.col("doc_a").alias("x"), F.col("doc_b").alias("y")),
        surv2.select(F.col("doc_id").alias("x")),
    )
    # members of a >1 cluster whose id isn't the representative are dropped;
    # re-derive per-doc labels cheaply: docs in pairs join their cluster via
    # the label frame is already aggregated — recompute membership by
    # joining each doc to the smallest cluster containing it through pairs'
    # closure is the components' job; use the summary: kept = representatives
    # + docs in no pair (singletons ARE their own representative).
    kept3 = comps.select(F.col("cluster").alias("doc_id"))
    dropped3 = surv2.join(kept3, "doc_id", "left_anti").select("doc_id")
    return (
        staged.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(~F.col("pass_quality"), 1).otherwise(0))
            .cast("long")
            .alias("dropped_quality"),
        )
        .join(
            surv1.join(surv2, "doc_id", "left_anti")
            .groupBy("source")
            .agg(F.count("*").cast("long").alias("dropped_exact")),
            "source",
            "left",
        )
        .join(
            surv2.join(dropped3, "doc_id", "left_semi")
            .groupBy("source")
            .agg(F.count("*").cast("long").alias("dropped_neardup")),
            "source",
            "left",
        )
        .select(
            "source",
            "n_docs",
            "dropped_quality",
            F.coalesce("dropped_exact", F.lit(0)).cast("long").alias("dropped_exact"),
            F.coalesce("dropped_neardup", F.lit(0)).cast("long").alias("dropped_neardup"),
            (
                F.col("n_docs")
                - F.col("dropped_quality")
                - F.coalesce("dropped_exact", F.lit(0))
                - F.coalesce("dropped_neardup", F.lit(0))
            ).cast("long").alias("kept"),
        )
        .orderBy("source")
    )
