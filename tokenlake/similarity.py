"""Similarity search over the `embeddings` table (vec_id, embedding:array<float>, label).

Brute-force cosine top-k is the correctness baseline; IVF bucket assignment
and random-hyperplane LSH are the scale paths (prune candidates before the
exact pass). All dot products are `F.aggregate`/`F.zip_with` column
expressions — JVM-side, no Python UDFs.

Scale notes: brute-force is a broadcast of the query vector over a full scan
(embarrassingly parallel, no shuffle except the final top-k, which Spark
executes as per-partition top-k + single reduce). IVF turns search into a
centroid equi-join: probe cost drops by ~K×.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Brute-force cosine top-k against the embedding of `query_vec_id`."""
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q")
    )
    sims = emb.crossJoin(F.broadcast(q)).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.round(cosine(F.col("embedding"), F.col("q")), 4).alias("cos_sim"),
    )
    return (
        sims.filter(F.col("vec_id") != query_vec_id)
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def ivf_assign(emb: DataFrame, n_centroids: int = 8) -> DataFrame:
    """IVF-lite: deterministic centroids = embeddings of the n smallest
    vec_ids; every vector is assigned to its max-cosine centroid. Returns
    (centroid_id, n_vecs) — the inverted-file bucket sizes."""
    cents = (
        emb.orderBy("vec_id")
        .limit(n_centroids)
        .select(F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c"))
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("centroid_id").cast("long").alias("centroid_id"),
        F.round(cosine(F.col("embedding"), F.col("c")), 6).alias("sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("centroid_id"))
    assigned = scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return assigned.groupBy("centroid_id").agg(F.count("*").cast("long").alias("n_vecs"))


def embedding_near_dup_pairs(emb: DataFrame, threshold: float = 0.45) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a, b) with cos ≥ threshold.

    This exact variant is O(n²) and exists as the correctness baseline /
    in-bucket verifier; the scale path blocks candidates first with
    `lsh_hyperplane_buckets` (random-hyperplane signatures turn near-dup
    search into an equi-join on bucket keys) and runs this join only within
    buckets — same two-stage shape as MinHash-LSH text dedup."""
    a = emb.select(F.col("vec_id").cast("long").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").cast("long").alias("vec_b"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    sim = F.round(cosine(F.col("ea"), F.col("eb")), 4)
    return (
        pairs.select("vec_a", "vec_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def lsh_hyperplane_buckets(emb: DataFrame, n_planes: int = 8, dim: int = 64, seed: int = 42) -> DataFrame:
    """Random-hyperplane LSH for cosine: bucket = sign-bit string of
    hyperplane dot products. Deterministic numpy hyperplanes inlined as
    literal arrays (broadcast with the plan). Rows-only check (no portable
    SQL oracle for the generated planes)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = None
    for i in range(n_planes):
        lit = F.array([F.lit(float(v)) for v in planes[i]])
        bit = F.when(_dot(F.col("embedding"), lit) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket * 2 + bit
    return (
        emb.select(F.col("vec_id").cast("long").alias("vec_id"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n_vecs"), F.min("vec_id").alias("min_vec"))
    )
