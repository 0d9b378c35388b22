"""Similarity search over embedding columns (`array<float>`).

* `cosine_topk` — brute-force exact top-k: broadcast the (small) query
  set, one scan over the corpus, per-query window rank. The correct
  baseline and the oracle-checkable path.
* `ann_topk` — sign-random-projection LSH: deterministic hyperplanes
  (seeded), bucket join, rank within bucket. The 100 TB path: candidate
  set per query is one bucket (+ optional multi-probe), never the corpus.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from henbun_spark.operators.dedup import cosine


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    Plan shape: broadcast(queries) crossJoin corpus -> Column-only cosine
    -> window rank. One shuffle (by query_id for the rank), corpus scanned
    once regardless of |queries|.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).cast("array<double>").alias("cvec"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).cast("array<double>").alias("qvec"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def lsh_bucket(df: DataFrame, emb_col: str, planes: np.ndarray, out: str = "bucket"):
    """Sign-random-projection bucket id as pure Column arithmetic: for each
    plane p, bit = (sum_i v[i]*p[i] > 0); bucket = Σ bit<<j. The plane
    coefficients are literals folded into the plan (no UDF, no broadcast
    needed for <=32 planes x few hundred dims)."""
    vec = F.col(emb_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec, arr, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
        )
        bucket = bucket + (dot > 0).cast("long") * F.lit(1 << j).cast("long")
    return df.withColumn(out, bucket)


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
    probe_hamming: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates = same LSH bucket (+ multi-probe).

    `probe_hamming` is the recall knob: each query additionally probes
    every bucket within that Hamming distance of its own (bit-flip masks
    are plan-time literals; the query side explodes into
    sum_{h<=probe_hamming} C(n_planes, h) probe rows). A neighbor lives in
    exactly one bucket, so probes never duplicate a (query, neighbor)
    pair. probe_hamming=1 recovers most neighbors lost to a single
    marginal hyperplane at ~(n_planes+1)x the (small) query-side join
    fan-out — the corpus is never rescanned.
    """
    from itertools import combinations

    if dim is None:
        dim = len(corpus.select(emb_col).first()[0])
    planes = _planes(dim, n_planes, seed)
    masks = [0]
    for h in range(1, probe_hamming + 1):
        for flip in combinations(range(n_planes), h):
            masks.append(sum(1 << j for j in flip))
    c = lsh_bucket(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(emb_col).cast("array<double>").alias("cvec"),
        ),
        "cvec",
        planes,
    )
    q = lsh_bucket(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(emb_col).cast("array<double>").alias("qvec"),
        ),
        "qvec",
        planes,
    )
    if len(masks) > 1:
        q = q.withColumn(
            "bucket",
            F.explode(
                F.array(
                    *[F.col("bucket").bitwiseXOR(F.lit(m).cast("long")) for m in masks]
                )
            ),
        )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
