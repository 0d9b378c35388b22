"""End-to-end optimization convergence — mirrors
`/root/reference/testing/test_model.py`: Adam drives SquareModel params to 0
(atol 1e-4 @ 1500 iters), collection-scoped freezing, Indexer semantics,
minibatch feeds.
"""

import numpy as np
import pytest

import henbun_spark as hb
from henbun_spark import autodiff as ad
from henbun_spark.model import Adam, Indexer
from henbun_spark.param import MinibatchData, Variable, graph_key


class SquareModel(hb.Model):
    """`testing/test_model.py:8-29`."""

    def setUp(self):
        self.p = Variable([2, 3])

    @hb.AutoOptimize()
    def likelihood(self):
        return -ad.sum(ad.square(self.p))


class TwoCollectionModel(hb.Model):
    """`testing/test_model.py:34-74`."""

    def setUp(self):
        self.p1 = Variable([2], collections=["col1"])
        self.p2 = Variable([2], collections=["col2"])

    @hb.AutoOptimize()
    def likelihood(self):
        return -ad.sum(ad.square(self.p1)) - ad.sum(ad.square(self.p2 - 1.0))


def test_square_model_converges():
    m = SquareModel()
    opt = m.likelihood()
    opt.compile(optimizer=Adam(learning_rate=0.01))
    opt.optimize(maxiter=1500)
    np.testing.assert_allclose(m.p.value, np.zeros((2, 3)), atol=1e-4)


def test_objective_improves_and_run_returns_scalar():
    m = SquareModel()
    opt = m.likelihood().compile(optimizer=Adam(learning_rate=0.01))
    before = float(opt.run())
    opt.optimize(maxiter=200)
    after = float(opt.run())
    assert after > before


def test_collection_scoped_optimization():
    """Freezing by collection: optimizing col1 must not touch p2."""
    m = TwoCollectionModel()
    m.initialize()
    p2_before = m.p2.value.copy()
    opt = m.likelihood()
    opt.compile(optimizer=Adam(learning_rate=0.01), collection="col1")
    opt.optimize(maxiter=1500)
    np.testing.assert_allclose(m.p1.value, np.zeros(2), atol=1e-3)
    np.testing.assert_array_equal(m.p2.value, p2_before)


def test_optimizer_memoized():
    m = SquareModel()
    assert m.likelihood() is m.likelihood()


def test_indexer_split_and_draws():
    """`model.py:126-153`: 90/10 split, uniform-with-replacement draws."""
    idx = Indexer(seed=0)
    idx.setUp(100)
    assert idx.train_size == 90
    assert idx.test_size == 10
    assert set(idx._train_index).isdisjoint(set(idx._test_index))
    draws = idx.train_index(1000)
    assert set(draws).issubset(set(idx._train_index))
    tdraws = idx.test_index(50)
    assert set(tdraws).issubset(set(idx._test_index))


class MinibatchModel(hb.Model):
    def setUp(self):
        rng = np.random.default_rng(0)
        self.x = MinibatchData(rng.normal(size=(200, 1)))
        self.mu = Variable([1])

    @hb.AutoOptimize()
    def lik(self):
        return ad.sum(hb.densities.gaussian(self.x, self.mu, 1.0))


def test_minibatch_training():
    """Minibatch SGD recovers the data mean."""
    m = MinibatchModel()
    opt = m.lik().compile(optimizer=Adam(learning_rate=0.05))
    assert m._index.data_size == 200
    opt.optimize(maxiter=800, minibatch_size=32)
    true_mean = m.x.value.mean()
    np.testing.assert_allclose(m.mu.value[0], true_mean, atol=0.15)


def test_validate_rejects_mismatched_minibatch_sizes():
    class Bad(hb.Model):
        def setUp(self):
            self.a = MinibatchData(np.zeros((10, 1)))
            self.b = MinibatchData(np.zeros((12, 1)))

    m = Bad()
    with pytest.raises(ValueError):
        m.validate()


def test_test_feed_dict_shape():
    m = MinibatchModel()
    m.validate()
    feeds = m.test_feed_dict(5)
    (batch,) = feeds.values()
    assert batch.shape == (5, 1)
