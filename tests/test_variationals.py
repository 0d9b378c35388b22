"""Variational operators — mirrors `/root/reference/testing/test_variationals.py`:
MC-vs-analytic KL (rtol 0.1, 100 samples), exact sample given pinned u,
logdet closed forms, LOCAL feeding, and an end-to-end VI fit.
"""

import numpy as np
import pytest

import henbun_spark as hb
from henbun_spark import autodiff as ad
from henbun_spark import variationals
from henbun_spark.model import Adam
from henbun_spark.param import graph_key


def analytic_gaussian_kl(q_mu, q_sigma):
    """KL(N(mu, s^2) || N(0,1)) summed (`test_variationals.py:326-347`)."""
    return np.sum(
        0.5 * (q_sigma**2 + q_mu**2 - 1.0) - np.log(q_sigma)
    )


class VModel(hb.Model):
    def setUp(self):
        self.q = variationals.Normal([10], n_layers=[3])


class VModelFull(hb.Model):
    def setUp(self):
        self.q = variationals.Normal([10], q_shape="fullrank")


def test_diagonal_sample_given_fixed_u():
    """sample == q_mu + exp(q_sqrt)*u exactly (`test_variationals.py:85-106`)."""
    m = VModel()
    m.initialize()
    u = np.random.default_rng(0).standard_normal((3, 10))
    m.q._fixed_u = u
    m.new_eval()
    with m.tf_mode():
        s = m.q
    q_mu = m.q.q_mu.value
    q_sqrt = m.q.q_sqrt.value
    np.testing.assert_allclose(s.data, q_mu + np.exp(q_sqrt) * u, atol=1e-10)


def test_fullrank_sample_given_fixed_u():
    m = VModelFull()
    m.initialize()
    u = np.random.default_rng(1).standard_normal(10)
    m.q._fixed_u = u
    m.new_eval()
    with m.tf_mode():
        s = m.q
    q_mu = m.q.q_mu.value
    q_sqrt = np.tril(m.q.q_sqrt.value)
    np.testing.assert_allclose(s.data, q_mu + q_sqrt @ u, atol=1e-10)


def test_logdet_closed_forms():
    """`test_variationals.py:69-83`."""
    m = VModel()
    m.initialize()
    np.testing.assert_allclose(
        m.q.logdet.data, 2.0 * m.q.q_sqrt.value, atol=1e-10
    )
    mf = VModelFull()
    mf.initialize()
    np.testing.assert_allclose(
        mf.q.logdet.data, np.log(np.diag(mf.q.q_sqrt.value) ** 2), atol=1e-10
    )


@pytest.mark.parametrize("cls", [VModel, VModelFull], ids=["diag", "fullrank"])
def test_mc_kl_close_to_analytic(cls):
    """Mean of 100 sampled KLs ~ closed-form Gaussian KL, rtol=0.1
    (`test_variationals.py:108-122`)."""
    m = cls()
    m.initialize()
    kls = []
    for i in range(300):
        m.new_eval(seed=1000 + i)
        with m.tf_mode():
            kls.append(float(m.KL().data))
    mc = np.mean(kls)
    q_mu = m.q.q_mu.value
    if m.q.q_shape == "diagonal":
        sigma = np.exp(m.q.q_sqrt.value)
        expected = analytic_gaussian_kl(q_mu, sigma)
    else:
        L = np.tril(m.q.q_sqrt.value)
        cov = L @ L.T
        expected = 0.5 * (
            np.trace(cov) + q_mu @ q_mu - 10 - np.log(np.linalg.det(cov))
        )
    np.testing.assert_allclose(mc, expected, rtol=0.1)


def test_local_variational_feed():
    """LOCAL variational fed from a wide tensor: q_mu then q_sqrt slices
    (`variationals.py:121-129`)."""
    m = hb.Model()
    m.q = variationals.Normal([2], collections=graph_key.LOCAL)
    m.initialize()
    rng = np.random.default_rng(0)
    wide = rng.normal(size=(5, 4))  # N=5, feed = [q_mu(2), q_sqrt(2)]
    u = rng.standard_normal((5, 2))
    m.q._fixed_u = u
    m.new_eval()
    with m.tf_mode():
        m.q = ad.Tensor(wide)  # tf_mode assignment feeds
        s = m.q
    expected = wide[:, :2] + np.exp(wide[:, 2:]) * u
    np.testing.assert_allclose(s.data, expected, atol=1e-10)


def test_gaussian_variational_scale():
    m = hb.Model()
    m.q = variationals.Gaussian([4], mean=2.0, stddev=0.5)
    m.initialize()
    m.new_eval(seed=7)
    with m.tf_mode():
        s = m.q
    assert s.shape == (4,)
    # scale initialized near |mean| = 2
    np.testing.assert_allclose(m.q.scale.value.mean(), 2.0, atol=1.0)


def test_offset_gaussian_tensor():
    m = hb.Model()
    m.q = variationals.OffsetGaussian([4], mean=5.0, stddev=0.5)
    m.initialize()
    samples = []
    for i in range(200):
        m.new_eval(seed=i)
        with m.tf_mode():
            samples.append(m.q.data.copy())
    assert np.abs(np.mean(samples) - 5.0) < 1.0


def test_beta_variational_in_unit_interval():
    m = hb.Model()
    m.q = variationals.Beta([4])
    m.initialize()
    m.new_eval(seed=3)
    with m.tf_mode():
        s = m.q
        kl = m.KL()
    assert np.all((s.data > 0) & (s.data < 1))
    assert np.isfinite(float(kl.data))


class VIFitModel(hb.Model):
    """Variational linear model (Henbun_structure2.ipynb style): infer the
    posterior mean of data ~ N(theta, 0.1^2) with q = Normal."""

    def setUp(self):
        rng = np.random.default_rng(0)
        self.y = hb.param.Data(2.0 + 0.1 * rng.standard_normal(60))
        self.theta = variationals.Normal([1])

    @hb.AutoOptimize()
    def elbo(self):
        lik = ad.sum(hb.densities.gaussian(self.y, self.theta, 0.01))
        return lik - self.KL()


def test_vi_fit_recovers_mean():
    m = VIFitModel()
    opt = m.elbo().compile(optimizer=Adam(learning_rate=0.02))
    opt.optimize(maxiter=1500)
    np.testing.assert_allclose(m.theta.q_mu.value[0], 2.0, atol=0.05)
    # posterior std ~ 0.1/sqrt(60)
    post_sd = np.exp(m.theta.q_sqrt.value[0])
    assert post_sd < 0.1
