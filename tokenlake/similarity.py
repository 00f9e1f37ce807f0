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


def _centroids(emb: DataFrame, n_centroids: int) -> DataFrame:
    """Deterministic centroids = embeddings of the n smallest vec_ids."""
    return (
        emb.orderBy("vec_id")
        .limit(n_centroids)
        .select(F.col("vec_id").cast("long").alias("centroid_id"), F.col("embedding").alias("c"))
    )


def _assign_to_centroids(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """Max-cosine centroid per vector (broadcast centroids, 6-decimal round
    + centroid_id tiebreak for cross-engine reproducibility). THE shared
    assignment — ivf_search and ivf_assign must never diverge on it."""
    from pyspark.sql import Window

    scored = emb.crossJoin(F.broadcast(cents)).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding"),
        F.col("centroid_id").cast("long").alias("centroid_id"),
        F.round(cosine(F.col("embedding"), F.col("c")), 6).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("centroid_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)


def ivf_search(
    emb: DataFrame,
    query_vec_id: int = 0,
    n_centroids: int = 8,
    nprobe: int = 2,
    k: int = 10,
) -> DataFrame:
    """IVF search: assign → probe the query's `nprobe` nearest centroid
    buckets → exact cosine within those inverted lists → top-k.

    Scale shape: the centroid table is tiny and broadcast twice (assignment
    and probe); the exact pass scans only ~nprobe/n_centroids of the corpus.
    Similarities are rounded to 6 decimals before argmax with a centroid_id
    tiebreak so assignment is reproducible across engines (DuckDB oracle)."""
    from pyspark.sql import Window

    cents = _centroids(emb, n_centroids)
    assigned = _assign_to_centroids(emb, cents).select(
        "vec_id", "embedding", "centroid_id"
    )
    q = emb.filter(F.col("vec_id") == query_vec_id).select(F.col("embedding").alias("q"))
    probed = (
        cents.crossJoin(F.broadcast(q))
        .select("centroid_id", F.round(cosine(F.col("c"), F.col("q")), 6).alias("qsim"))
        .orderBy(F.col("qsim").desc(), "centroid_id")
        .limit(nprobe)
        .select("centroid_id")
    )
    cand = assigned.join(F.broadcast(probed), "centroid_id", "left_semi")
    sims = cand.crossJoin(F.broadcast(q)).select(
        "vec_id", F.round(cosine(F.col("embedding"), F.col("q")), 4).alias("cos_sim")
    )
    return (
        sims.filter(F.col("vec_id") != query_vec_id)
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(k)
    )


def _assign_to_literal_centroids(emb: DataFrame, cents: list) -> DataFrame:
    """Max-cosine assignment against driver-held centroid vectors inlined as
    literals (broadcast with the plan); ties break to the lowest centroid id."""
    sims = [
        F.round(cosine(F.col("embedding"), F.array([F.lit(float(v)) for v in c])), 6)
        for c in cents
    ]
    best = F.greatest(*sims) if len(sims) > 1 else sims[0]
    cid = None
    for i, s in enumerate(sims):
        cid = F.when(s == best, F.lit(i)) if cid is None else cid.when(s == best, F.lit(i))
    return emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        "embedding",
        cid.cast("long").alias("cid"),
        best.alias("sim"),
    )


def ivf_train(emb: DataFrame, n_centroids: int = 8, iters: int = 3) -> DataFrame:
    """Deterministic Lloyd k-means for IVF lists — the iterative-algorithm
    shape Spark ML uses: the driver loop carries only the k centroid vectors
    (O(k×dim) floats); each iteration is one broadcast assignment plus one
    per-dimension mean aggregate over the corpus. Init = embeddings of the k
    smallest vec_ids (same seed centroids as ivf_assign/ivf_search). Empty
    clusters keep their previous centroid. Returns the final inverted-list
    summary (cid, n_vecs, avg_sim).

    Scale notes: assignment is a full scan with literal centroids (no
    shuffle); the update aggregates posexploded (cid, dim) pairs — k×dim
    groups regardless of corpus size, map-side combined."""
    cents = [
        list(r["embedding"])
        for r in emb.orderBy("vec_id").limit(n_centroids).collect()
    ]
    # fewer rows than requested centroids: train what exists (the rebuild
    # below indexed past the collected list and crashed with IndexError)
    n_centroids = min(n_centroids, len(cents))
    if n_centroids == 0:
        raise ValueError("ivf_train needs at least one embedding row")
    cents = cents[:n_centroids]
    for _ in range(iters):
        assigned = _assign_to_literal_centroids(emb, cents)
        ex = assigned.select("cid", F.posexplode("embedding").alias("pos", "v"))
        rows = ex.groupBy("cid", "pos").agg(F.avg("v").alias("m")).collect()
        by_cid: dict = {}
        for r in rows:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = r["m"]
        cents = [
            [by_cid[i][p] for p in sorted(by_cid[i])] if i in by_cid else cents[i]
            for i in range(n_centroids)
        ]
    final = _assign_to_literal_centroids(emb, cents)
    return (
        final.groupBy("cid")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.round(F.avg("sim"), 4).alias("avg_sim"),
        )
        .orderBy("cid")
    )


def ivf_assign(emb: DataFrame, n_centroids: int = 8) -> DataFrame:
    """IVF-lite: deterministic centroids = embeddings of the n smallest
    vec_ids; every vector is assigned to its max-cosine centroid. Returns
    (centroid_id, n_vecs) — the inverted-file bucket sizes."""
    assigned = _assign_to_centroids(emb, _centroids(emb, n_centroids))
    return assigned.groupBy("centroid_id").agg(F.count("*").cast("long").alias("n_vecs"))


def embedding_near_dup_pairs(emb: DataFrame, threshold: float = 0.45) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a, b) with cos ≥ threshold.

    This exact variant is O(n²) and exists as the correctness baseline and
    pytest oracle for `embedding_near_dup_pairs_lsh`, which is the scale
    path (random-hyperplane band buckets → equi-join candidates → exact
    cosine within) and the registered `dedup_embedding` driver query."""
    a = emb.select(F.col("vec_id").cast("long").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").cast("long").alias("vec_b"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    sim = F.round(cosine(F.col("ea"), F.col("eb")), 4)
    return (
        pairs.select("vec_a", "vec_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def hyperplanes(n: int, dim: int = 64, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes shared by the Spark plan and the
    DuckDB oracle (both inline the same literals)."""
    return np.random.default_rng(seed).standard_normal((n, dim))


def _bucket_expr(planes: np.ndarray) -> Column:
    """Sign-bit signature of one band's hyperplane dot products.

    Guarded on the embedding length: zip_with null-pads a dimension
    mismatch, the dot goes NULL, every bit falls to 0, and ALL vectors
    silently land in bucket 0 (one giant bucket → the near-dup candidate
    join degenerates to all pairs). Fail loudly instead."""
    dim = planes.shape[1]
    bucket = None
    for row in planes:
        lit = F.array([F.lit(float(v)) for v in row])
        bit = F.when(_dot(F.col("embedding"), lit) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket * 2 + bit
    ok = F.size("embedding") == dim
    return F.when(ok, bucket.cast("long")).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"embedding dimension mismatch: hyperplanes are {dim}-d, row has "),
                F.size("embedding").cast("string"),
                F.lit(" values — pass dim=<actual> to the LSH entry point"),
            )
        ).cast("long")
    )


def lsh_hyperplane_buckets(emb: DataFrame, n_planes: int = 8, dim: int = 64, seed: int = 42) -> DataFrame:
    """Random-hyperplane LSH for cosine: bucket = sign-bit string of
    hyperplane dot products. Deterministic numpy hyperplanes inlined as
    literal arrays (broadcast with the plan). Rows-only check (no portable
    SQL oracle for the generated planes)."""
    bucket = _bucket_expr(hyperplanes(n_planes, dim, seed))
    return (
        emb.select(F.col("vec_id").cast("long").alias("vec_id"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n_vecs"), F.min("vec_id").alias("min_vec"))
    )


def embedding_near_dup_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.45,
    n_planes: int = 4,
    n_bands: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Banded-LSH embedding near-dup: hyperplane sign buckets per band →
    candidate pairs = equal (band, bucket) equi-join → exact cosine only
    within candidates. The scale path the O(n²) `embedding_near_dup_pairs`
    baseline verifies (same two-stage shape as MinHash-LSH text dedup,
    textops.py:149-184).

    Per-band collision probability for a pair at angle θ is (1-θ/π)^n_planes;
    n_bands independent bands lift recall to 1-(1-p)^b. Defaults (4 bits × 8
    bands) target the test corpus's cos≈0.45 near-dups at ~80% recall; at
    corpus scale raise n_planes so bucket population stays bounded (bucket
    count = 2^n_planes per band) and add bands to recover recall.

    The plan is cartesian-free: one scan computes all band signatures
    (explode), candidates come from an equi-join on (band, bucket), and the
    exact join touches candidate pairs only."""
    planes = hyperplanes(n_bands * n_planes, dim, seed)
    base = emb.select(F.col("vec_id").cast("long").alias("vec_id"), "embedding")
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                _bucket_expr(planes[b * n_planes : (b + 1) * n_planes]).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    sig = base.select("vec_id", F.explode(bands).alias("bb")).select(
        "vec_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = sig.select(F.col("vec_id").alias("vec_a"), "band", "bucket")
    b = sig.select(F.col("vec_id").alias("vec_b"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    ea = emb.select(F.col("vec_id").cast("long").alias("vec_a"), F.col("embedding").alias("ea"))
    eb = emb.select(F.col("vec_id").cast("long").alias("vec_b"), F.col("embedding").alias("eb"))
    pairs = cand.join(ea, "vec_a").join(eb, "vec_b")
    sim = F.round(cosine(F.col("ea"), F.col("eb")), 4)
    return pairs.select("vec_a", "vec_b", sim.alias("cos_sim")).filter(
        F.col("cos_sim") >= threshold
    )


def dedup_components(
    emb: DataFrame,
    threshold: float = 0.45,
    n_planes: int = 4,
    n_bands: int = 8,
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over the near-duplicate pair graph — the
    keep-one-per-cluster primitive of a dedup pipeline: every vector's
    cluster id is the SMALLEST vec_id reachable through near-dup edges
    (embedding_near_dup_pairs_lsh), so "keep the representative" is
    `filter(vec_id == cluster)`. Returns the per-cluster summary
    (cluster, n_members, max_member), singletons included.

    Scale notes: min-label propagation — each iteration is ONE equi-join
    of the labels onto the symmetric edge list plus a groupBy-min over
    (V + E) rows, converging in O(graph diameter) iterations (near-dup
    graphs are shallow: duplicates cluster tightly). Labels are
    localCheckpoint()ed per iteration so the plan stays linear instead of
    doubling (the standard iterative-algorithm discipline; GraphFrames'
    connected components runs the same alternating min-label shape).
    Convergence is detected with a changed-labels probe (LIMIT 1), so
    quiet graphs stop after diameter+1 rounds, and `max_iter` bounds
    adversarial chains. Deterministic: labels are ids, min is total."""
    pairs = embedding_near_dup_pairs_lsh(emb, threshold, n_planes, n_bands)
    ids = emb.select(F.col("vec_id").cast("long").alias("x"))
    return min_label_components(
        pairs.select(F.col("vec_a").alias("x"), F.col("vec_b").alias("y")),
        ids,
        max_iter=max_iter,
    )


def min_label_components(
    pairs: DataFrame, ids: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Shared components engine (see dedup_components for the scale
    notes): `pairs` is (x, y) undirected-edge rows, `ids` the full vertex
    set as (x). Returns (cluster, n_members, max_member) sorted."""
    edges = pairs.union(
        pairs.select(F.col("y").alias("x"), F.col("x").alias("y"))
    ).localCheckpoint()
    labels = ids.withColumn("lbl", F.col("x")).localCheckpoint()
    for _ in range(max_iter):
        prop = edges.join(labels, "x").select(F.col("y").alias("x"), "lbl")
        new = (
            labels.unionByName(prop)
            .groupBy("x")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "x")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:
        # exiting via max_iter with labels still moving means a component's
        # diameter exceeds the bound — the labels are WRONG (partial
        # propagation), and silently returning them hands callers incorrect
        # dedup clusters with no signal (r6 advice). Fail loudly; callers
        # with genuinely deep graphs raise max_iter.
        raise RuntimeError(
            f"min_label_components did not converge in max_iter={max_iter} "
            "rounds (labels still changing — a component's diameter exceeds "
            "the bound); raise max_iter for deep graphs"
        )
    return (
        labels.groupBy(F.col("lbl").alias("cluster"))
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.max("x").cast("long").alias("max_member"),
        )
        .orderBy("cluster")
    )
