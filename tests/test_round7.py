"""Round-7 optimization tests: output-identical plan restructurings.

pack_sequences moved from a per-source unbounded window (single reducer per
source — a scale-killer on a hot source) to two-level bucketed prefix sums.
The contract: identical output rows, no Window partitioned by `source`
alone over the full frame (the tiny per-bucket offset window is exempt —
it runs over O(#buckets) rows).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window, functions as F

from tokenlake import textops
from tokenlake.decode_job import decode


def _reference_pack(docs, window=4096):
    """The round-6 single-window formulation — the semantic spec."""
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = F.sum("n_chars").over(w)
    pack = F.floor((cum - F.col("n_chars")) / F.lit(window)).cast("long")
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        pack.alias("pack_id"),
    )
    pos_w = Window.partitionBy("source", "pack_id").orderBy("doc_id")
    return base.withColumn("pack_pos", F.row_number().over(pos_w).cast("long"))


def test_pack_sequences_matches_single_window_reference(spark):
    rng = np.random.default_rng(17)
    # skewed: one hot source with scattered ids (negatives included), plus
    # small sources; bucket_rows far below the row count so multiple
    # buckets genuinely participate in the prefix-sum decomposition
    hot_n = 6000
    pdf = pd.DataFrame(
        {
            "doc_id": np.r_[
                rng.integers(-(2**40), 2**40, hot_n),
                np.arange(500) * 7 - 999,
                np.arange(300),
            ],
            "source": ["hot"] * hot_n + ["cold_a"] * 500 + ["cold_b"] * 300,
            "n_chars": rng.integers(1, 3000, hot_n + 800),
        }
    )
    docs = spark.createDataFrame(pdf)
    want = (
        _reference_pack(docs, 2048)
        .orderBy("source", "doc_id", "pack_pos")
        .collect()
    )
    got = (
        textops.pack_sequences(docs, 2048, bucket_rows=512)
        .orderBy("source", "doc_id", "pack_pos")
        .collect()
    )
    assert want == got


def test_pack_sequences_plan_has_no_per_source_data_window(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(1000),
            "source": ["s"] * 1000,
            "n_chars": [100] * 1000,
        }
    )
    docs = spark.createDataFrame(pdf)
    plan = (
        textops.pack_sequences(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected window specs in the pack plan"
    # every window over the data is partitioned by (source, _bkt) or
    # (source, pack_id); the only source-alone window is the per-bucket
    # offset prefix (ordered by _bkt, O(#buckets) rows)
    for s in specs:
        assert ("_bkt" in s) or ("pack_id" in s), s


def test_single_attempt_decode_plan_is_exchange_free(spark, tmp_path):
    """The dedup semi-join is skipped when the encoded table holds exactly
    one attempt partition: decode must plan as scan -> MapInArrow with no
    Exchange at all."""
    from tokenlake import encode_job
    from tokenlake.schema import generate_sequences

    tbl = generate_sequences(scale=0.02)
    import pyarrow.parquet as pq

    src = str(tmp_path / "in.parquet")
    pq.write_table(tbl, src)
    seq = spark.read.parquet(src)
    out = str(tmp_path / "out")
    encode_job.run(spark, seq, out)
    plan = decode(spark, out)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "MapInArrow" in plan
    # and the decode is still correct
    n = decode(spark, out).count()
    assert n == tbl.num_rows
