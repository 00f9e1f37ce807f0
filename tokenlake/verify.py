"""Bit-identical verification: decoded vs source, per row (north_rule).

The one relational join in the engine (SURVEY.md §2.8): decoded ⋈ source on
doc_id with array equality on tokens — the analog of the leaderboard's
post-rewrite schema-equality assertion (reference
src/parquet-linter-leaderboard/src/main.rs:325-333), strengthened to value
equality per row. Expressed declaratively so Catalyst plans the join (sort-
merge on doc_id; both sides are big).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def verify_by_hash(source: DataFrame, decoded: DataFrame) -> dict:
    """Scale-path verification: no join. Each side is reduced to
    (count, sum(xxhash64(<all shared columns>))) per source — two scans and
    a tiny aggregate instead of shuffling both full datasets. A single
    differing row flips the sum with probability 1 - 2^-64; use
    verify_bit_identical for the exact per-row certificate.

    Null-safe (Spark's xxhash64 folds nulls deterministically) and
    extras-aware: every column the two frames share participates, so a
    generic table's double/timestamp/bool columns are covered too.

    At 10^12 rows this is the only verification shape that stays one pass:
    the full-outer join variant shuffles 2× the corpus.

    Both digests run as ONE job (union of side-tagged aggregates): the two
    map stages are independent, so Spark schedules them concurrently and the
    source-side scan back-fills cores the decode side leaves idle — two
    sequential collects serialized them and paid the cluster ramp-down tail
    twice (guide §2.6).
    """
    cols = sorted(set(source.columns) & set(decoded.columns))

    def digest(df: DataFrame, side: str) -> DataFrame:
        # decimal(38,0) sum: 10^12 rows × |2^63| stays within 38 digits, and
        # never trips the ANSI long-overflow that sum(bigint) would
        h = F.xxhash64(*cols).cast("decimal(38,0)")
        return df.groupBy("source").agg(
            F.count("*").alias("rows"), F.sum(h).alias("h")
        ).select(F.lit(side).alias("side"), "source", "rows", "h")

    both = digest(source, "s").unionAll(digest(decoded, "d")).collect()
    s = {r["source"]: (r["rows"], r["h"]) for r in both if r["side"] == "s"}
    d = {r["source"]: (r["rows"], r["h"]) for r in both if r["side"] == "d"}
    mismatched = sorted(k for k in s.keys() | d.keys() if s.get(k) != d.get(k))
    rows = sum(r for r, _ in s.values())
    return {
        "rows": rows,
        "sources": len(s),
        "mismatched_sources": mismatched,
        "pass": not mismatched,
    }


def verify_bit_identical(source: DataFrame, decoded: DataFrame) -> dict:
    """Returns {'rows': n, 'matched': m, 'missing': k, 'mismatched': j}.

    A row matches iff its key joins AND every shared column agrees
    null-safely. One job: full-outer join + conditional agg.

    Null doc_ids can't equi-join, so the join key is
    coalesce(doc_id, '<null>#' || xxhash64(content)): a null-doc row pairs
    with its decoded twin by content. Duplicate keys would make the
    full-outer join many-to-many (2 source copies vs 1 decoded copy must
    NOT certify as 2 matches — round-4 advice), so a per-key row_number
    disambiguates: copies are ranked by their content hash on BOTH sides
    (deterministic, so the k-th copy of one side pairs with the k-th
    identical-content copy of the other even when a doc_id is duplicated
    with differing content against the input contract), and a lost copy
    counts as missing."""
    from pyspark.sql import Window

    cols = sorted(set(source.columns) & set(decoded.columns))
    value_cols = [c for c in cols if c != "doc_id"]

    def keyed(df: DataFrame, prefix: str) -> DataFrame:
        key = F.coalesce(
            F.col("doc_id"),
            F.concat(F.lit("<null>#"), F.xxhash64(*cols).cast("string")),
        )
        sel = [
            key.alias("_k0"),
            F.xxhash64(*cols).alias("_h"),
            F.lit(1).alias(f"{prefix}_present"),
        ]
        # existence marker: a NULL column value must not read as "row
        # absent" after the full-outer join
        sel += [F.col(c).alias(f"{prefix}_{c}") for c in value_cols]
        w = Window.partitionBy("_k0").orderBy("_h")
        return (
            df.select(*sel)
            .withColumn(
                "_k", F.concat_ws("#", "_k0", F.row_number().over(w).cast("string"))
            )
            .drop("_k0", "_h")
        )

    s = keyed(source, "s")
    d = keyed(decoded, "d")
    j = s.join(d, "_k", "full_outer")
    match = F.col("s_present").isNotNull() & F.col("d_present").isNotNull()
    for c in value_cols:
        match = match & F.col(f"s_{c}").eqNullSafe(F.col(f"d_{c}"))
    agg = j.agg(
        F.count("*").alias("rows"),
        F.sum(F.when(F.col("s_present").isNull(), 1).otherwise(0)).alias("extra"),
        F.sum(F.when(F.col("d_present").isNull(), 1).otherwise(0)).alias("missing"),
        F.sum(F.when(match, 1).otherwise(0)).alias("matched"),
    ).first()
    rows = agg["rows"]
    # F.sum over a zero-row join is NULL, not 0: an empty-vs-empty verify
    # (zero-doc input) must pass instead of raising TypeError on int - None
    matched = agg["matched"] or 0
    missing = agg["missing"] or 0
    extra = agg["extra"] or 0
    return {
        "rows": rows,
        "matched": matched,
        "missing": missing,
        "extra": extra,
        "mismatched": rows - matched - missing - extra,
        "pass": rows == matched,
    }
