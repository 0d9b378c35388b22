"""GP kernels (reference: `/root/reference/Henbun/gp/kernels.py`).

The pairwise kernel matrix is the engine's "join": a cross product by
geometry (`kernels.py:54-84`). On Spark this runs as numpy inside grouped
pandas UDFs — the batch axis `[N, n, d]` is the distribution axis (group
key / partition), each task materializing one Gram tile. The math below is
autodiff-traced so lengthscales (plain or variational) receive gradients.

At 100 TB scale the Gram computation for large n becomes a blocked
crossJoin of row-blocks producing tiles (see
`henbun_spark.operators.similarity` for the relational formulation); the
in-UDF path here is for the bounded-n GP workloads the reference targets
(inducing points m <= ~1k, `testing/test_gp.py:16`).
"""

from __future__ import annotations

import numpy as np

from henbun_spark import autodiff as ad
from henbun_spark import transforms
from henbun_spark.config import settings
from henbun_spark.param import Parameterized, Variable, graph_key
from henbun_spark.variationals import Variational


class Kern(Parameterized):
    """Base kernel (`kernels.py:28-34`)."""

    def __init__(self):
        Parameterized.__init__(self)


class UnitStationary(Kern):
    """Unit-variance stationary kernel with (ARD) lengthscales
    (`kernels.py:36-101`). ``lengthscales`` may be a numpy array (becomes a
    positive-transformed Variable), a Variable, or a Variational."""

    def __init__(self, lengthscales=np.ones(1), n_batch=None, collections=None):
        Kern.__init__(self)
        collections = collections if collections is not None else [graph_key.VARIABLES]
        if isinstance(lengthscales, np.ndarray):
            self.lengthscales = Variable(
                list(lengthscales.shape),
                transform=transforms.positive(),
                collections=collections,
            )
            self.lengthscales = lengthscales  # deferred assign
        elif isinstance(lengthscales, (Variable, Variational)):
            self.lengthscales = lengthscales
        else:
            raise TypeError("lengthscales must be ndarray, Variable or Variational")

    def _ls(self):
        return object.__getattribute__(self, "lengthscales").tensor()

    def square_dist(self, X, X2=None):
        """Pairwise scaled squared distance via -2XX' + |X|^2 + |X2|^2
        (`kernels.py:54-84`). X: [n,d] or batched [N,n,d]; returns [n,n2]
        or [N,n,n2]."""
        X = X if isinstance(X, ad.Tensor) else ad.Tensor(X)
        ls = self._ls()
        Xeff = X / ls
        Xs = ad.square(Xeff).sum(axis=-1)  # [n] or [N,n]
        if X2 is None:
            X2eff, X2s = Xeff, Xs
        else:
            X2 = X2 if isinstance(X2, ad.Tensor) else ad.Tensor(X2)
            X2eff = X2 / ls
            X2s = ad.square(X2eff).sum(axis=-1)
        cross = Xeff @ X2eff.T  # [n,n2] / [N,n,n2]
        a = Xs.reshape(tuple(Xs.shape) + (1,))
        b = X2s.reshape(tuple(X2s.shape[:-1]) + (1, X2s.shape[-1]))
        return -2.0 * cross + a + b

    def euclid_dist(self, X, X2):
        """`kernels.py:86-88`."""
        return ad.sqrt(self.square_dist(X, X2) + 1e-12)

    def Kdiag(self, X):
        """Unit variance -> ones (`kernels.py:90-91`)."""
        X = X if isinstance(X, ad.Tensor) else ad.Tensor(X)
        return ad.Tensor(np.ones(X.shape[:-1]))

    def Cholesky(self, X):
        """cholesky(K(X) + jitter*I) (`kernels.py:93-101`), batched over
        the leading axis; jitter from settings (henbunrc:11)."""
        X = X if isinstance(X, ad.Tensor) else ad.Tensor(X)
        n = X.shape[-2]
        jitter = np.eye(n) * settings.numerics.jitter_level
        return ad.cholesky(self.K(X) + jitter)


class UnitRBF(UnitStationary):
    """K = exp(-d^2/2) (`kernels.py:103-111`)."""

    def K(self, X, X2=None):
        return ad.exp(-0.5 * self.square_dist(X, X2))


class UnitCsymRBF(UnitStationary):
    """Cylindrically-symmetric RBF (`kernels.py:113-131`):
    K = exp(-d^2(x,x2)/2) + exp(-d^2(x,-x2)/2)."""

    def K(self, X, X2=None):
        if X2 is None:
            X2 = X if isinstance(X, ad.Tensor) else ad.Tensor(X)
        else:
            X2 = X2 if isinstance(X2, ad.Tensor) else ad.Tensor(X2)
        return ad.exp(-0.5 * self.square_dist(X, X2)) + ad.exp(
            -0.5 * self.square_dist(X, -X2)
        )

    def Kdiag(self, X):
        X = X if isinstance(X, ad.Tensor) else ad.Tensor(X)
        Xeff = X / self._ls()
        Xs = ad.square(Xeff).sum(axis=-1)
        return 1.0 + ad.exp(-2.0 * Xs)
