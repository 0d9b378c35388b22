"""Small math utilities (the reference's `tf_wraps`).

Each helper is dual-mode: given a pyspark ``Column`` it returns a Column
expression (stays inside whole-stage codegen); given numpy input it
computes eagerly. Reference: `/root/reference/Henbun/tf_wraps.py:26-48`.
"""

from __future__ import annotations

import math

import numpy as np

try:
    from pyspark.sql import Column
    from pyspark.sql import functions as F
except ImportError:  # pragma: no cover - numpy-only contexts
    Column = ()  # type: ignore
    F = None


def is_column(x) -> bool:
    return isinstance(x, Column)


def _lit(v):
    return F.lit(float(v))


def eye(n: int) -> np.ndarray:
    """Identity matrix (`tf_wraps.py:26-30`)."""
    return np.eye(n)


def clip(x, cfg=None):
    """Optional global value clamp (`tf_wraps.py:33-39`, henbunrc:12-14).

    No-op unless ``settings.numerics.clip_by_value`` is set; guards
    over/underflow in NN outputs and variational samples.
    """
    from henbun_spark.config import settings

    num = (cfg or settings).numerics
    if not num.clip_by_value:
        return x
    lo, hi = num.clip_value_min, num.clip_value_max
    if is_column(x):
        return F.least(F.greatest(x, _lit(lo)), _lit(hi))
    from henbun_spark import autodiff as ad

    if isinstance(x, ad.Tensor):
        return ad.clip(x, lo, hi)
    return np.clip(x, lo, hi)


def tri_vec_size(n: int) -> int:
    """Free-vector length for one n x n lower-triangular matrix."""
    return n * (n + 1) // 2


def tri_mat_size(m: int) -> int:
    """Matrix side length for a triangular free vector of length m;
    raises if m is not a triangular number."""
    n = int(((8 * m + 1) ** 0.5 - 1) / 2)
    if tri_vec_size(n) != m:
        raise ValueError(f"{m} is not a triangular number")
    return n


def _tri_basis(n: int) -> np.ndarray:
    """[m, n*n] 0/1 scatter matrix: row k puts vec element k at the k-th
    row-major lower-triangle position. vec_to_tri becomes a matmul with a
    constant — differentiable through the autodiff engine with no custom
    scatter op (the reference needs a compiled custom TF op for this,
    `tf_wraps.py:52-63`)."""
    rows, cols = np.tril_indices(n)
    m = rows.size
    basis = np.zeros((m, n * n), dtype=np.float64)
    basis[np.arange(m), rows * n + cols] = 1.0
    return basis


def vec_to_tri(x):
    """Pack free vectors into lower-triangular matrices
    (`tf_wraps.py:52-63`): [d, m] -> [d, n, n] with m = n(n+1)/2, filled
    row-major on the lower triangle. numpy arrays or autodiff Tensors."""
    from henbun_spark import autodiff as ad

    is_t = isinstance(x, ad.Tensor)
    m = int(x.shape[-1])
    n = tri_mat_size(m)
    basis = _tri_basis(n)
    if is_t:
        return (x @ ad.Tensor(basis)).reshape((-1, n, n))
    x = np.asarray(x, dtype=np.float64)
    return (x @ basis).reshape(-1, n, n)


def tri_to_vec(mats) -> np.ndarray:
    """Inverse of `vec_to_tri`: [d, n, n] (or [n, n]) -> [d, m]."""
    mats = np.asarray(mats, dtype=np.float64)
    if mats.ndim == 2:
        mats = mats[None]
    n = mats.shape[-1]
    rows, cols = np.tril_indices(n)
    return mats[:, rows, cols]


def log_sum_exp(x, axis=None):
    """Max-shifted, overflow-safe log-sum-exp (`tf_wraps.py:42-48`).

    numpy-only; the pairwise Column version used by densities.bimixture
    lives in `densities.py`.
    """
    x = np.asarray(x)
    m = np.max(x, axis=axis, keepdims=True)
    out = np.log(np.sum(np.exp(x - m), axis=axis, keepdims=True)) + m
    if axis is None:
        return float(out.reshape(()))
    return np.squeeze(out, axis=axis)


# --- lgamma -----------------------------------------------------------
# scipy is not available in this runtime; vectorized Lanczos (g=7, n=9)
# approximation, ~1e-13 relative accuracy for positive reals. Used by
# the poisson / gamma / student-t / beta densities (densities.py) both
# driver-side and inside pandas UDFs.

_LANCZOS_G = 7.0
_LANCZOS_COEF = np.array(
    [
        0.99999999999980993,
        676.5203681218851,
        -1259.1392167224028,
        771.32342877765313,
        -176.61502916214059,
        12.507343278686905,
        -0.13857109526572012,
        9.9843695780195716e-6,
        1.5056327351493116e-7,
    ]
)


def lgamma(x):
    """Vectorized log-Gamma for positive reals (Lanczos approximation)."""
    x = np.asarray(x, dtype=np.float64)
    scalar = x.ndim == 0
    x = np.atleast_1d(x).copy()
    out = np.empty_like(x)
    small = x < 0.5
    # reflection formula for x < 0.5
    if np.any(small):
        xs = x[small]
        out[small] = np.log(np.pi / np.abs(np.sin(np.pi * xs))) - _lgamma_core(1.0 - xs)
    if np.any(~small):
        out[~small] = _lgamma_core(x[~small])
    return float(out[0]) if scalar else out


def _lgamma_core(x: np.ndarray) -> np.ndarray:
    z = x - 1.0
    series = np.full_like(z, _LANCZOS_COEF[0])
    for i in range(1, len(_LANCZOS_COEF)):
        series = series + _LANCZOS_COEF[i] / (z + i)
    t = z + _LANCZOS_G + 0.5
    return 0.5 * math.log(2.0 * math.pi) + (z + 0.5) * np.log(t) - t + np.log(series)


def digamma(x):
    """Vectorized digamma (d/dx lgamma) for positive reals.

    Recurrence psi(x) = psi(x+1) - 1/x to push x >= 6, then the standard
    asymptotic series — ~1e-12 accuracy; the gradient of `lgamma` in
    autodiff objectives.
    """
    x = np.asarray(x, dtype=np.float64)
    scalar = x.ndim == 0
    x = np.atleast_1d(x).astype(np.float64).copy()
    out = np.zeros_like(x)
    for _ in range(6):
        small = x < 6.0
        if not np.any(small):
            break
        out[small] -= 1.0 / x[small]
        x[small] += 1.0
    inv = 1.0 / x
    inv2 = inv * inv
    out += (
        np.log(x)
        - 0.5 * inv
        - inv2 * (1.0 / 12.0 - inv2 * (1.0 / 120.0 - inv2 / 252.0))
    )
    return float(out[0]) if scalar else out
