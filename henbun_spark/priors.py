"""Priors — densities wrapped with a reduce-sum (`/root/reference/Henbun/priors.py:28-116`).

Dual-mode like `densities`:
* numpy input (global parameters, driver-side): returns the scalar
  **sum** of elementwise log densities, matching the reference.
* Column input (LOCAL parameters): returns the per-row log-density
  Column; the engine aggregates with ``F.sum`` (Spark's partial+final
  agg is the distributed reduce_sum).
"""

from __future__ import annotations

import numpy as np

from henbun_spark import autodiff as ad
from henbun_spark import densities
from henbun_spark.utils import is_column


def _coerce(x):
    if is_column(x) or isinstance(x, ad.Tensor):
        return x
    return np.asarray(x)


def _reduce(x):
    if is_column(x):
        return x
    if isinstance(x, ad.Tensor):
        return x.sum()
    return float(np.sum(x))


class Prior:
    def logp(self, x):
        raise NotImplementedError

    def __str__(self):
        return self.__class__.__name__


class Normal(Prior):
    """Zero-mean unit-variance Gaussian (`priors.py:44-52`)."""

    def logp(self, x):
        if is_column(x):
            return densities.gaussian(x, 0.0, 1.0)
        if isinstance(x, ad.Tensor):
            return -0.5 * (np.log(2 * np.pi) + ad.square(x)).sum()
        x = np.asarray(x, dtype=np.float64)
        return float(-0.5 * np.sum(np.log(2 * np.pi) + np.square(x)))

    def __str__(self):
        return "N(0,1)"


class Gaussian(Prior):
    """`priors.py:55-65`."""

    def __init__(self, mu, var):
        self.mu = np.atleast_1d(np.asarray(mu, dtype=np.float64))
        self.var = np.atleast_1d(np.asarray(var, dtype=np.float64))

    def logp(self, x):
        if is_column(x):
            return densities.gaussian(x, float(self.mu[0]), float(self.var[0]))
        return _reduce(densities.gaussian(_coerce(x), self.mu, self.var))

    def __str__(self):
        return f"N({self.mu},{self.var})"


class LogNormal(Prior):
    """`priors.py:68-78`."""

    def __init__(self, mu, var):
        self.mu = np.atleast_1d(np.asarray(mu, dtype=np.float64))
        self.var = np.atleast_1d(np.asarray(var, dtype=np.float64))

    def logp(self, x):
        if is_column(x):
            return densities.lognormal(x, float(self.mu[0]), float(self.var[0]))
        return _reduce(densities.lognormal(_coerce(x), self.mu, self.var))

    def __str__(self):
        return f"logN({self.mu},{self.var})"


class Gamma(Prior):
    """`priors.py:81-91`."""

    def __init__(self, shape, scale):
        self.shape = np.atleast_1d(np.asarray(shape, dtype=np.float64))
        self.scale = np.atleast_1d(np.asarray(scale, dtype=np.float64))

    def logp(self, x):
        if is_column(x):
            return densities.gamma(float(self.shape[0]), float(self.scale[0]), x)
        return _reduce(densities.gamma(self.shape, self.scale, _coerce(x)))

    def __str__(self):
        return f"Ga({self.shape},{self.scale})"


class Laplace(Prior):
    """`priors.py:94-104`."""

    def __init__(self, mu, sigma):
        self.mu = np.atleast_1d(np.asarray(mu, dtype=np.float64))
        self.sigma = np.atleast_1d(np.asarray(sigma, dtype=np.float64))

    def logp(self, x):
        if is_column(x):
            return densities.laplace(float(self.mu[0]), float(self.sigma[0]), x)
        return _reduce(densities.laplace(self.mu, self.sigma, _coerce(x)))

    def __str__(self):
        return f"Lap.({self.mu},{self.sigma})"


class Uniform(Prior):
    """Constant log-height * size(x) (`priors.py:107-116`)."""

    def __init__(self, lower=0.0, upper=1.0):
        self.lower, self.upper = lower, upper
        self.log_height = -np.log(upper - lower)

    def logp(self, x):
        if is_column(x):
            from pyspark.sql import functions as F

            return F.lit(float(self.log_height))
        if isinstance(x, ad.Tensor):
            return float(self.log_height * x.size)
        return float(self.log_height * np.size(np.asarray(x)))

    def __str__(self):
        return f"U({self.lower},{self.upper})"
