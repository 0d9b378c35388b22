"""Constraint bijectors (reference: `/root/reference/Henbun/transforms.py`).

Each transform maps an unconstrained ("free") value x to the constrained
domain y and back, and reports the log-Jacobian of the forward map — the
KL correction term (`Henbun/variationals.py:208`).

Triple-mode dispatch:
* pyspark ``Column``  -> Column expression (whole-stage codegen, per-element
  log-Jacobian; the engine aggregates).
* ``autodiff.Tensor`` -> differentiable graph (objective tracing inside
  pandas UDFs / driver eval; log-Jacobian summed like the reference).
* numpy               -> eager numpy (initialization, tests; summed log-Jac).

``backward`` (constrained -> free) is numpy-only, used for `assign` on the
driver exactly as in the reference (`transforms.py` backward methods).
"""

from __future__ import annotations

import numpy as np

from henbun_spark import autodiff as ad
from henbun_spark.utils import is_column

try:
    from pyspark.sql import functions as F
except ImportError:  # pragma: no cover
    F = None


def _is_ad(x) -> bool:
    return isinstance(x, ad.Tensor)


class Transform:
    """forward: free -> constrained; backward: constrained -> free."""

    def forward(self, x):
        raise NotImplementedError

    def backward(self, y):
        raise NotImplementedError

    def log_jacobian(self, x):
        """log |dy/dx|: summed over elements (numpy / Tensor modes),
        per-element (Column mode)."""
        raise NotImplementedError

    def __str__(self):
        return self.__class__.__name__


class Identity(Transform):
    """y = x (`transforms.py:73-87`)."""

    def forward(self, x):
        return x

    def backward(self, y):
        return np.asarray(y)

    def log_jacobian(self, x):
        if is_column(x):
            return F.lit(0.0)
        if _is_ad(x):
            return ad.Tensor(0.0)
        return 0.0


class Exp(Transform):
    """y = exp(x) + lower (`transforms.py:90-107`)."""

    def __init__(self, lower: float = 1e-6):
        self._lower = lower

    def forward(self, x):
        if is_column(x):
            return F.exp(x) + F.lit(float(self._lower))
        if _is_ad(x):
            return ad.exp(x) + self._lower
        return np.exp(x) + self._lower

    def backward(self, y):
        return np.log(np.asarray(y) - self._lower)

    def log_jacobian(self, x):
        if is_column(x):
            return x
        if _is_ad(x):
            return x.sum()
        return float(np.sum(np.asarray(x, dtype=np.float64)))


class Log1pe(Transform):
    """Softplus: y = log(1 + exp(x)) + lower (`transforms.py:110-143`).

    Exported as ``transforms.positive`` like the reference
    (`transforms.py:271`). Overflow-safe: softplus(x) = max(x,0) +
    log1p(exp(-|x|)).
    """

    def __init__(self, lower: float = 1e-6):
        self._lower = lower

    def forward(self, x):
        if is_column(x):
            return (
                F.greatest(x, F.lit(0.0))
                + F.log1p(F.exp(-F.abs(x)))
                + F.lit(float(self._lower))
            )
        if _is_ad(x):
            return ad.softplus(x) + self._lower
        x = np.asarray(x, dtype=np.float64)
        return np.maximum(x, 0.0) + np.log1p(np.exp(-np.abs(x))) + self._lower

    def backward(self, y):
        # inverse softplus: x = y' + log(1 - exp(-y')), y' = y - lower
        ys = np.asarray(y, dtype=np.float64) - self._lower
        return ys + np.log(-np.expm1(-ys))

    def log_jacobian(self, x):
        # d/dx softplus = sigmoid(x); log sigmoid(x) = -softplus(-x)
        if is_column(x):
            return -(F.greatest(-x, F.lit(0.0)) + F.log1p(F.exp(-F.abs(x))))
        if _is_ad(x):
            return (-ad.softplus(-x)).sum()
        x = np.asarray(x, dtype=np.float64)
        return float(np.sum(-(np.maximum(-x, 0.0) + np.log1p(np.exp(-np.abs(x))))))


class Logistic(Transform):
    """y = a + (b - a) / (1 + exp(-x)) (`transforms.py:146-180`)."""

    def __init__(self, a: float = 0.0, b: float = 1.0):
        assert b > a
        self.a, self.b = float(a), float(b)

    def forward(self, x):
        if is_column(x):
            return F.lit(self.a) + F.lit(self.b - self.a) / (F.lit(1.0) + F.exp(-x))
        if _is_ad(x):
            return ad.sigmoid(x) * (self.b - self.a) + self.a
        x = np.asarray(x, dtype=np.float64)
        return self.a + (self.b - self.a) / (1.0 + np.exp(-x))

    def backward(self, y):
        y = np.asarray(y, dtype=np.float64)
        z = (y - self.a) / (self.b - self.a)
        return np.log(z / (1.0 - z))

    def log_jacobian(self, x):
        # dy/dx = (b-a) * sig(x) * (1-sig(x));
        # log = log(b-a) - softplus(x) - softplus(-x)
        if is_column(x):
            sp = F.greatest(x, F.lit(0.0)) + F.log1p(F.exp(-F.abs(x)))
            spm = F.greatest(-x, F.lit(0.0)) + F.log1p(F.exp(-F.abs(x)))
            return F.lit(np.log(self.b - self.a)) - sp - spm
        if _is_ad(x):
            return (
                np.log(self.b - self.a) - ad.softplus(x) - ad.softplus(-x)
            ).sum()
        x = np.asarray(x, dtype=np.float64)
        sp = np.maximum(x, 0.0) + np.log1p(np.exp(-np.abs(x)))
        spm = np.maximum(-x, 0.0) + np.log1p(np.exp(-np.abs(x)))
        return float(np.sum(np.log(self.b - self.a) - sp - spm))


class LowerTriangular(Transform):
    """Pack free vectors into lower-triangular matrices
    (`transforms.py:183-269` — shipped disabled in the reference because
    it needs a compiled custom TF op, `tf_wraps.py:52-63`; here
    `utils.vec_to_tri` is a constant-basis matmul, so it works in both
    numpy and autodiff modes with no custom kernel).

    x: free vector of length num_matrices * n(n+1)/2 ->
    y: [n, n, num_matrices] stack of lower-triangular matrices
    (squeezed to [n, n] when num_matrices == 1 and squeeze=True).
    No Column mode: the output is matrix-shaped and lives inside UDF /
    driver compute, never in a per-row Column expression.
    """

    def __init__(self, num_matrices: int = 1, squeeze: bool = False):
        self.num_matrices = int(num_matrices)
        self.squeeze = bool(squeeze)

    def _n(self, total_len: int) -> int:
        from henbun_spark.utils import tri_mat_size

        if total_len % self.num_matrices:
            raise ValueError(
                f"free length {total_len} not divisible by {self.num_matrices}"
            )
        return tri_mat_size(total_len // self.num_matrices)

    def forward(self, x):
        from henbun_spark.utils import vec_to_tri

        if is_column(x):
            raise TypeError("LowerTriangular has no Column mode (matrix-shaped)")
        size = int(x.size if hasattr(x, "size") else np.size(x))
        self._n(size)  # validate
        if _is_ad(x):
            tri = vec_to_tri(x.reshape((self.num_matrices, -1)))  # [D,n,n]
            out = ad.transpose(tri, (1, 2, 0))  # [n,n,D]
            return out.reshape(tuple(out.shape[:2])) if (
                self.squeeze and self.num_matrices == 1
            ) else out
        x = np.asarray(x, dtype=np.float64)
        tri = vec_to_tri(x.reshape(self.num_matrices, -1))
        out = np.transpose(tri, (1, 2, 0))
        return out[:, :, 0] if (self.squeeze and self.num_matrices == 1) else out

    def backward(self, y):
        from henbun_spark.utils import tri_to_vec

        y = np.asarray(y, dtype=np.float64)
        if y.ndim == 2:
            y = y[:, :, None]
        return tri_to_vec(np.transpose(y, (2, 0, 1))).ravel()

    def log_jacobian(self, x):
        # pure re-indexing (volume-preserving on the packed coordinates);
        # the reference returns -inf to forbid density accounting through
        # this transform — mirror that contract
        if _is_ad(x):
            return ad.Tensor(-np.inf)
        return -np.inf


positive = Log1pe  # `transforms.py:271`
