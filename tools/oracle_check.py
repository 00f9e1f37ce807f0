#!/usr/bin/env python3
"""Mimic the driver's correctness gate: run every queries() entry and its
oracle_sql() on the same sf dir, compare row counts + sorted values.

Usage: python tools/oracle_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def kinds(df: pd.DataFrame) -> dict:
    """Type kinds per column — the driver hashes raw values, so an int64
    column on one side vs float64 (e.g. uncast DuckDB sum() → HUGEINT) on the
    other is a hash mismatch even when the numbers are equal. No coercion
    here, so this check predicts the driver (round-1 lesson)."""
    return {c: df[c].dtype.kind for c in df.columns}


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from tokenlake.queries import ORACLES, QUERIES
    from tokenlake.session import get_spark

    spark = get_spark(master="local[8]", app_name="oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        sql = ORACLES.get(name)
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"✗ {name}: spark error: {str(e)[:300]}")
            continue
        if sql is None:
            print(f"~ {name}: rows-only ({len(got)} rows)")
            if len(got) == 0:
                failures.append((name, "0 rows"))
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"✗ {name}: duckdb error: {str(e)[:300]}")
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            failures.append((name, f"columns {list(g.columns)} vs {list(w.columns)}"))
            print(f"✗ {name}: column mismatch {list(g.columns)} vs {list(w.columns)}")
            continue
        if kinds(g) != kinds(w):
            bad = {c: (kinds(g)[c], kinds(w)[c]) for c in g.columns if kinds(g)[c] != kinds(w)[c]}
            failures.append((name, f"dtype kind mismatch {bad}"))
            print(f"✗ {name}: dtype kind mismatch {bad}")
            continue
        if len(g) != len(w):
            failures.append((name, f"rows {len(g)} vs {len(w)}"))
            print(f"✗ {name}: row count {len(g)} vs {len(w)}")
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, rtol=1e-6, atol=1e-9)
            print(f"✓ {name} ({len(g)} rows)")
        except AssertionError as e:
            failures.append((name, "value mismatch"))
            diff = (g != w)
            bad_cols = [c for c in g.columns if diff[c].any()]
            print(f"✗ {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:2]:
                idx = diff[c].idxmax()
                print(f"    {c}[{idx}]: spark={g[c][idx]!r} duckdb={w[c][idx]!r}")
    print(f"\n{'PASS' if not failures else 'FAIL'}: {len(failures)} failures of {len(QUERIES if not only else only)}")
    for n, r in failures:
        print(f"  - {n}: {r[:200]}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
