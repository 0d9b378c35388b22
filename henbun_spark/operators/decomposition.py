"""Distributed PCA over an embedding column.

The classic two-phase distributed PCA (as in MLlib's RowMatrix
``computePrincipalComponents``): the cluster reduces the data to its
second-moment statistics — mean vector and Gram matrix X^T X, dim x dim
doubles regardless of row count — and the driver eigendecomposes the
covariance (dim is small: embeddings are 10s-1000s wide; the eigh is
O(dim^3) driver work, trivial next to the scan). No reference analogue
(the reference is a VI library); part of the brief-mandated
training-data-pipeline surface (SURVEY §2.11).

Scale design (100 TB stance):
* ONE mapInPandas pass emits one partial-stats row per Arrow batch
  (count, sum vector, Gram matrix) — the wide embedding column never
  shuffles; partials reduce in-cluster via ``RDD.treeAggregate``
  (depth 2), so the driver receives exactly one (dim x dim) matrix —
  the same pattern as ``clustering.kmeans_fit`` and SparkTrainer.
* Projection for serving is pure Column math with the component
  coefficients folded into the plan as literals (whole-stage codegen,
  zero Python in the hot path) — same pattern as ``kmeans_assign``.

Determinism: eigenvector signs are fixed by making each component's
largest-|coefficient| entry positive; ties in eigenvalues keep numpy's
ascending-eigenvalue order reversed (largest variance first).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pca_fit", "pca_project", "suff_stats", "eig_from_stats"]


def suff_stats(
    df: DataFrame, emb_col: str
) -> tuple[int, np.ndarray, np.ndarray]:
    """The (n, sum vector, Gram matrix flat) sufficient statistics of
    ``df[emb_col]`` — ONE mapInPandas pass + treeAggregate; the driver
    receives a single dim + dim^2 float vector regardless of row count.
    Addition-mergeable (associative + commutative), which is what makes
    the streaming maintenance (`streaming.pca_stream_maintenance`)
    batch-split-independent.
    """
    import pandas as pd

    def partials(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        n = 0
        s = None
        g = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            n += len(x)
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            gram = x.T @ x
            g = gram if g is None else g + gram
        if n == 0:
            return
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
        )

    part_df = df.select(
        F.col(emb_col).cast("array<double>").alias("_v")
    ).mapInPandas(partials, "n long, s array<double>, g array<double>")

    def seq(acc, row):
        n, s, g = acc
        return (
            n + row["n"],
            (np.asarray(row["s"]) if s is None else s + np.asarray(row["s"])),
            (np.asarray(row["g"]) if g is None else g + np.asarray(row["g"])),
        )

    def comb(a, b):
        if a[0] == 0:
            return b
        if b[0] == 0:
            return a
        return (a[0] + b[0], a[1] + b[1], a[2] + b[2])

    n, s, g = part_df.rdd.treeAggregate((0, None, None), seq, comb, depth=2)
    if n == 0:
        raise ValueError("suff_stats: empty input")
    return int(n), np.asarray(s, dtype=np.float64), np.asarray(
        g, dtype=np.float64
    ).ravel()


def eig_from_stats(
    n: int, s: np.ndarray, g: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(components k x dim, explained_variance k, mean dim) from the
    (n, sum, Gram) sufficient statistics — the driver-side half of
    PCA, shared by the batch fit and the streaming-state drain.
    Covariance = (G - n * mu mu^T) / (n - 1); eigenvector signs are
    canonicalized (largest-|coefficient| entry positive) so the fit is
    deterministic."""
    if n < 2:
        raise ValueError(f"PCA needs >= 2 rows, got {n}")
    s = np.asarray(s, dtype=np.float64)
    dim = s.shape[0]
    g = np.asarray(g, dtype=np.float64).reshape(dim, dim)
    mu = s / n
    cov = (g - n * np.outer(mu, mu)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k x dim
    # deterministic sign: largest-|coef| entry of each component positive
    flip = np.sign(comps[np.arange(len(comps)), np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    return comps, evals[order], mu


def pca_fit(
    df: DataFrame, emb_col: str, k: int = 4
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (components k x dim, explained_variance k, mean dim):
    `suff_stats` (one distributed pass) + `eig_from_stats` (driver
    O(dim^3))."""
    n, s, g = suff_stats(df, emb_col)
    return eig_from_stats(n, s, g, k)


def pca_project(
    df: DataFrame,
    emb_col: str,
    components: np.ndarray,
    mean: np.ndarray,
    prefix: str = "pc",
) -> DataFrame:
    """Project each embedding onto the fitted components: pc_i =
    (x - mu) . comp_i, as pure Column folds with coefficients as
    plan-time literals (whole-stage codegen; no Python)."""
    vec = F.col(emb_col).cast("array<double>")
    comps = np.asarray(components, dtype=np.float64)
    mu = np.asarray(mean, dtype=np.float64)
    cols = []
    for i, c in enumerate(comps):
        arr = F.array(*[F.lit(float(x)) for x in c])
        dot = F.aggregate(
            F.zip_with(vec, arr, lambda a, b: a * b),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        cols.append((dot - float(mu @ c)).alias(f"{prefix}{i + 1}"))
    return df.select("*", *cols)
