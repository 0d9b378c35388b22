"""GP kernels + sampling — mirrors `/root/reference/testing/test_kernels.py`
and `test_gp.py`: kernel values vs hand-written numpy loops (RefRBF /
RefCsymRBF), batch==non-batch consistency, Cholesky LL^T ~ K, gradient
existence, SparseGP numeric smoke (no NaNs).
"""

import numpy as np
import pytest

import henbun_spark as hb
from henbun_spark import autodiff as ad
from henbun_spark import variationals
from henbun_spark.gp import kernels
from henbun_spark.gp.gp import GP, SparseGP

RNG = np.random.default_rng(0)


def ref_rbf(X, X2, ls):
    """Hand-loop reference (`test_kernels.py:10-35`)."""
    K = np.zeros((len(X), len(X2)))
    for i in range(len(X)):
        for j in range(len(X2)):
            d = (X[i] - X2[j]) / ls
            K[i, j] = np.exp(-0.5 * np.sum(d * d))
    return K


def ref_csym_rbf(X, X2, ls):
    """`test_kernels.py:38-63`."""
    K = np.zeros((len(X), len(X2)))
    for i in range(len(X)):
        for j in range(len(X2)):
            d = (X[i] - X2[j]) / ls
            dp = (X[i] + X2[j]) / ls
            K[i, j] = np.exp(-0.5 * np.sum(d * d)) + np.exp(-0.5 * np.sum(dp * dp))
    return K


def _make(kern_cls, ls):
    m = hb.Model()
    m.kern = kern_cls(lengthscales=ls)
    m.initialize()
    m.new_eval()
    return m


@pytest.mark.parametrize("ls", [np.array([1.3]), np.array([0.8, 1.7, 0.5])],
                         ids=["scalar", "ard"])
def test_rbf_values(ls):
    m = _make(kernels.UnitRBF, ls)
    X = RNG.normal(size=(12, 3))
    X2 = RNG.normal(size=(7, 3))
    with m.tf_mode():
        K = m.kern.K(X, X2)
        Kx = m.kern.K(X)
        Kd = m.kern.Kdiag(X)
    lsb = np.broadcast_to(ls, (3,))
    np.testing.assert_allclose(K.data, ref_rbf(X, X2, lsb), atol=1e-4)
    np.testing.assert_allclose(Kx.data, ref_rbf(X, X, lsb), atol=1e-4)
    np.testing.assert_allclose(Kd.data, np.ones(12), atol=1e-10)


@pytest.mark.parametrize("ls", [np.array([1.3]), np.array([0.8, 1.7, 0.5])],
                         ids=["scalar", "ard"])
def test_csym_rbf_values(ls):
    m = _make(kernels.UnitCsymRBF, ls)
    X = RNG.normal(size=(10, 3))
    X2 = RNG.normal(size=(6, 3))
    with m.tf_mode():
        K = m.kern.K(X, X2)
        Kd = m.kern.Kdiag(X)
    lsb = np.broadcast_to(ls, (3,))
    np.testing.assert_allclose(K.data, ref_csym_rbf(X, X2, lsb), atol=1e-4)
    np.testing.assert_allclose(Kd.data, np.diag(ref_csym_rbf(X, X, lsb)), atol=1e-6)


def test_batched_matches_nonbatched():
    """`test_kernels.py:150-183`: [N,n,d] batch equals per-slice 2-d calls."""
    m = _make(kernels.UnitRBF, np.array([1.1]))
    Xb = RNG.normal(size=(4, 8, 2))
    with m.tf_mode():
        Kb = m.kern.K(Xb)
        slices = [m.kern.K(Xb[i]).data for i in range(4)]
    np.testing.assert_allclose(Kb.data, np.stack(slices), atol=1e-10)


def test_cholesky_reconstruction():
    """LL^T ~ K within atol 9e-4 (`test_kernels.py:184-226`)."""
    m = _make(kernels.UnitRBF, np.array([1.0]))
    X = RNG.normal(size=(20, 2))
    with m.tf_mode():
        L = m.kern.Cholesky(X)
        K = m.kern.K(X)
    np.testing.assert_allclose(L.data @ L.data.T, K.data, atol=9e-4)


def test_kernel_gradient_exists():
    """`test_kernels.py:134-139`: gradients flow to lengthscales."""
    m = _make(kernels.UnitRBF, np.array([1.2]))
    X = RNG.normal(size=(9, 2))
    m.new_eval()
    with m.tf_mode():
        obj = ad.sum(m.kern.K(X))
    obj.backward()
    ls_var = m.kern.lengthscales
    assert ls_var._leaf.grad is not None
    assert np.any(ls_var._leaf.grad != 0)


def test_gp_samples_shape_and_whitening():
    """GP.samples = u @ chol(K)^T (`gp/gp.py:37-50`)."""
    m = hb.Model()
    m.gp = GP(kernels.UnitRBF())
    m.u = variationals.Normal([30, 15])  # [N=30, n=15]
    m.initialize()
    x = RNG.normal(size=(15, 2))
    m.new_eval(seed=0)
    with m.tf_mode():
        s = m.gp.samples(x, m.u)
    assert s.shape == (30, 15)
    assert np.isfinite(s.data).all()


@pytest.mark.parametrize("mode", ["neglected", "diagonal", "fullrank"])
def test_sparse_gp_samples_no_nan(mode):
    """`test_gp.py:10-29` smoke (m scaled down for CI speed; the reference
    uses m=600 inducing points)."""
    m = hb.Model()
    m.gp = SparseGP(kernels.UnitRBF(), z=np.linspace(-3, 3, 60)[:, None])
    m.initialize()
    x = np.linspace(-2.5, 2.5, 40)[:, None]
    u = RNG.standard_normal((5, 60))
    m.new_eval(seed=1)
    with m.tf_mode():
        s = m.gp.samples(ad.Tensor(x), ad.Tensor(u), q_shape=mode)
    assert s.shape == (5, 40)
    assert np.isfinite(s.data).all()


def test_sparse_gp_gradient_to_z():
    """`test_gp.py:42-55`: gradient exists wrt inducing points."""
    m = hb.Model()
    m.gp = SparseGP(kernels.UnitRBF(), z=np.linspace(-2, 2, 10)[:, None])
    m.initialize()
    x = np.linspace(-1, 1, 8)[:, None]
    u = RNG.standard_normal((3, 10))
    m.new_eval(seed=2)
    with m.tf_mode():
        s = m.gp.samples(ad.Tensor(x), ad.Tensor(u), q_shape="neglected")
        obj = ad.sum(ad.square(s))
    obj.backward()
    z_var = object.__getattribute__(m.gp, "z")
    assert z_var._leaf.grad is not None
    assert np.any(z_var._leaf.grad != 0)


def test_sparse_gp_approximates_dense():
    """With z == x, the sparse 'neglected' sample equals the dense GP
    sample for the same u (whitening consistency)."""
    x = np.linspace(-1, 1, 12)[:, None]
    u = RNG.standard_normal((4, 12))

    md = hb.Model()
    md.gp = GP(kernels.UnitRBF())
    md.initialize()
    md.new_eval(seed=3)
    with md.tf_mode():
        dense = md.gp.samples(ad.Tensor(x), ad.Tensor(u))

    ms = hb.Model()
    ms.gp = SparseGP(kernels.UnitRBF(), z=x)
    ms.initialize()
    ms.new_eval(seed=3)
    with ms.tf_mode():
        sparse = ms.gp.samples(ad.Tensor(x), ad.Tensor(u), q_shape="neglected")
    # dense: u @ L^T; sparse with z=x: u @ (L^-1 K) = u @ L^T (since K=LL^T)
    # agreement only up to the jitter (1e-5 I enters the two paths
    # differently), so the tolerance is jitter-limited
    np.testing.assert_allclose(dense.data, sparse.data, atol=1e-2)


def test_sparse_gp_distributed_matches_driver(spark):
    """G3 execution shape: SparseGP posterior via spark_exec.predict over a
    coordinate DataFrame == the driver-side computation, per coordinate,
    under the same fixed u (q_shape='neglected' so no MC noise enters)."""
    import pandas as pd

    from henbun_spark.spark_exec import ColumnData, predict

    rng = np.random.default_rng(5)
    x = np.linspace(-2, 2, 25)
    z = np.linspace(-2, 2, 8).reshape(-1, 1)
    u = rng.standard_normal((6, 8))

    class GPPost(hb.Model):
        def setUp(self):
            self.idx = ColumnData("idx")
            self.x = ColumnData("x")
            self.gp = SparseGP(kernels.UnitRBF(), z)
            self.u = hb.Data(u)

        def posterior_summary(self):
            s = self.gp.samples(
                self.x.reshape((-1, 1)), self.u, q_shape="neglected"
            )
            return {
                "idx": self.idx.data.astype(np.int64),
                "mean": s.data.mean(axis=0),
            }

    coords = spark.createDataFrame(
        pd.DataFrame({"idx": np.arange(25, dtype=np.float64), "x": x})
    ).repartition(5)
    got = (
        predict(GPPost(), coords, "posterior_summary", "idx long, mean double")
        .toPandas()
        .sort_values("idx")
        .reset_index(drop=True)
    )
    assert len(got) == 25

    m = hb.Model()
    m.gp = SparseGP(kernels.UnitRBF(), z)
    m.initialize()
    with m.tf_mode():
        s = m.gp.samples(ad.Tensor(x.reshape(-1, 1)), ad.Tensor(u), q_shape="neglected")
    expect = s.data.mean(axis=0)
    np.testing.assert_allclose(got["mean"].to_numpy(), expect, rtol=1e-10)
