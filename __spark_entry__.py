"""Driver contract for the spark-graft builder (PySpark target).

The engine is `tokenlake/` — a PySpark-native per-column lightweight-
compression engine (dict/RLE/FSST/bit-pack/frame-of-reference with sampled
cost-based auto-selection, mirroring parquet-linter's lint rules) plus the
training-data pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing, and the token-level family: vocab stats,
ExactSubstr-style span dedup, train/eval decontamination, and the curation
funnel — which also runs off the encoded format via projected decode).

queries()/oracle_sql() cover SURVEY.md §2 line-by-line; see
tokenlake/queries.py for the per-operator reference citations. Entries whose
semantics aren't SQL-expressible (custom codec encode/decode, xxhash simhash,
generated LSH hyperplanes) have no oracle → driver records rows-only.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full engine roundtrip on sf0.001 — documents → tokenized
    sequences → chunked auto-selected encode → decode → per-source
    bit-identity counts. Driver checks rows > 0 and a stable schema."""
    from tokenlake.queries import tl_roundtrip_check

    return tl_roundtrip_check(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tokenlake.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from tokenlake.queries import ORACLES

    return dict(ORACLES)
