"""Round-4 regression tests: ADVICE fixes (compact in-place guard,
plan_from_encoded stats-none+bloom inference, lint deep-pass fraction),
then null support, generic columns, BSS, and str_prefix as they land."""

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from tokenlake import encode_job, lint_job
from tokenlake.plan import Prescription
from tokenlake.schema import SEQUENCES_SPARK_SCHEMA, generate_sequences


def _df(spark, scale=0.01, profiles=("lowcard",), skew=False):
    tbl = generate_sequences(scale=scale, profiles=list(profiles), skew=skew)
    return spark.createDataFrame(tbl.to_pandas(), schema=SEQUENCES_SPARK_SCHEMA)


# ------------------------------------------ compact dest/src overlap guard

def test_compact_refuses_in_place_and_nested_dirs(spark, tmp_path):
    """An in-place `compact out/ -o out/` (or nested dest) would wipe the
    source table before copying anything — must refuse up front."""
    out = str(tmp_path / "out")
    encode_job.run(spark, _df(spark), out, resume=False)
    for dest in (out, out + "/", f"{out}/sub", str(tmp_path)):
        with pytest.raises(ValueError, match="overlaps"):
            encode_job.compact(spark, out, dest)
    # a disjoint sibling dir is fine
    encode_job.compact(spark, out, str(tmp_path / "out2"))


# ------------------------------------------ X1: statistics none + bloom true

def test_plan_from_encoded_stats_none_with_bloom(spark, tmp_path):
    """`statistics none` + `bloom_filter true` must round-trip as exactly
    that: inference keeps the bloom on but must NOT promote it to
    stats_level='page' (which would re-enable the disabled statistics)."""
    out = str(tmp_path / "out")
    cfg = Prescription.parse(
        "set column tokens statistics none\n"
        "set column tokens bloom_filter true\n"
        "set column doc_id statistics none\n"
    ).apply()
    encode_job.run(spark, _df(spark), out, cfg=cfg, resume=False)
    inferred = encode_job.plan_from_encoded(spark, out)
    assert inferred.stats_level.get("tokens") == "none"
    assert inferred.stats_level.get("doc_id") == "none"
    assert "tokens" in inferred.bloom  # the filter itself is preserved
    # and bloom_for still returns it despite the none level
    assert inferred.bloom_for("tokens") is not None


# ------------------------------------------ lint deep pass fraction floor

def test_lint_deep_pass_skips_saturated_sources(spark):
    """A small-chunk source whose screening fraction already ≥ `fraction`
    must keep its (better-sampled) screening decision — the deep pass at a
    LOWER rate must not override it. With scale=0.01 every source's
    screening floor saturates past fraction=0.05, so the two-pass lint must
    equal the single-pass lint's prescription exactly."""
    df = _df(spark, scale=0.01, profiles=("lowcard", "sorted_ts", "random"))
    df.cache().count()
    d2 = lint_job.lint(spark, df, fraction=0.05)
    d1 = lint_job.lint(spark, df, fraction=0.05, two_pass=False)
    assert (
        lint_job.prescription_from_decisions(d2).format()
        == lint_job.prescription_from_decisions(d1).format()
    )
    df.unpersist()


def test_lint_two_pass_no_global_window(spark):
    """The ambiguous-chunk selection must not funnel all chunk ids through a
    single-partition row_number window (straggler at millions of chunks)."""
    df = _df(spark, scale=0.05, profiles=("lowcard", "highcard", "smallrange"))
    d = lint_job.lint(spark, df, fraction=0.3)
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "row_number" not in plan.lower()
