"""NN encoder — mirrors `/root/reference/testing/test_nn.py` and
`test_nn_model.py`: shapes, activation wiring (none after final layer),
gradient flow, end-to-end convergence, Bayesian-NN weight polymorphism.
"""

import numpy as np

import henbun_spark as hb
from henbun_spark import autodiff as ad
from henbun_spark import nn, variationals
from henbun_spark.model import Adam
from henbun_spark.param import Variable, graph_key


def test_matbias_shape_and_value():
    m = hb.Model()
    m.layer = nn.MatBias([3, 2])
    m.initialize()
    x = np.random.default_rng(0).normal(size=(5, 3))
    m.new_eval()
    with m.tf_mode():
        y = m.layer(ad.Tensor(x))
    assert y.shape == (5, 2)
    w = m.layer.w.value
    b = m.layer.b.value
    np.testing.assert_allclose(y.data, x @ w + b, atol=1e-10)


def test_neuralnet_no_activation_after_final_layer():
    """`nn.py:73-84`: final layer is affine."""
    m = hb.Model()
    m.net = nn.NeuralNet([2, 4, 1], neuron_types="sigmoid")
    m.initialize()
    x = np.random.default_rng(1).normal(size=(7, 2))
    m.new_eval()
    with m.tf_mode():
        y = m.net(ad.Tensor(x))
    w0, b0 = m.net[0].w.value, m.net[0].b.value
    w1, b1 = m.net[1].w.value, m.net[1].b.value
    h = 1.0 / (1.0 + np.exp(-(x @ w0 + b0)))
    np.testing.assert_allclose(y.data, h @ w1 + b1, atol=1e-8)


def test_gradient_flows_to_all_layers():
    m = hb.Model()
    m.net = nn.NeuralNet([2, 4, 1], neuron_types="relu")
    m.initialize()
    x = np.random.default_rng(2).normal(size=(10, 2))
    m.new_eval()
    with m.tf_mode():
        y = m.net(ad.Tensor(x))
        loss = ad.sum(ad.square(y))
    loss.backward()
    for i in range(2):
        assert m.net[i].w._leaf.grad is not None
        assert np.any(m.net[i].w._leaf.grad != 0)


class NNRegression(hb.Model):
    """`testing/test_nn_model.py:19-28`-style: fit y = tanh-net(x)."""

    def setUp(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(-2, 2, size=(80, 1))
        y = np.sin(x)
        self.x = hb.param.Data(x)
        self.y = hb.param.Data(y)
        self.net = nn.NeuralNet([1, 8, 1], neuron_types="tanh", stddev=0.5)

    @hb.AutoOptimize()
    def lik(self):
        pred = self.net(self.x)
        return -ad.sum(ad.square(pred - self.y))


def test_nn_regression_converges():
    m = NNRegression()
    opt = m.lik().compile(optimizer=Adam(learning_rate=0.01))
    before = float(opt.run())
    opt.optimize(maxiter=1000)
    after = float(opt.run())
    assert after > before
    # average squared error per point below 0.05
    assert -after / 80 < 0.05


def test_bayesian_nn_with_variational_weights():
    """`nn.py:36-54` polymorphism: Variational weights sample per eval."""
    m = hb.Model()
    m.net = nn.NeuralNet(
        [2, 3], variable_types=variationals.Normal, neuron_types="sigmoid"
    )
    m.initialize()
    x = np.random.default_rng(3).normal(size=(4, 2))
    outs = []
    for i in range(2):
        m.new_eval(seed=i)
        with m.tf_mode():
            outs.append(m.net(ad.Tensor(x)).data.copy())
    # stochastic weights -> different outputs across evals
    assert not np.allclose(outs[0], outs[1])
    m.new_eval(seed=5)
    with m.tf_mode():
        kl = m.KL()
    assert np.isfinite(float(kl.data))


def test_local_feed_through_encoder():
    """Encoder output feeds LOCAL variational (amortized inference,
    README.md:14-21): the full M5 wiring."""
    m = hb.Model()
    m.enc = nn.NeuralNet([3, 8, 4], neuron_types="relu")
    m.q = variationals.Normal([2], collections=graph_key.LOCAL)
    m.initialize()
    x = np.random.default_rng(4).normal(size=(6, 3))
    m.new_eval(seed=0)
    with m.tf_mode():
        m.q = m.enc(ad.Tensor(x))  # feed: width 4 = q_mu(2) + q_sqrt(2)
        s = m.q
        kl = m.KL()
        loss = ad.sum(ad.square(s)) + kl
    loss.backward()
    assert s.shape == (6, 2)
    assert m.enc[0].w._leaf.grad is not None
    assert np.any(m.enc[0].w._leaf.grad != 0)
