"""Transform identities — mirrors `/root/reference/testing/test_transforms.py`:
forward/backward round-trip, numpy-vs-Column parity, hand-coded log-Jacobian
vs finite-difference log-det-Jacobian. Loops over Transform subclasses so new
transforms are auto-covered.
"""

import numpy as np
import pytest

from henbun_spark import autodiff as ad
from henbun_spark import transforms

RNG = np.random.default_rng(0)
X = RNG.normal(size=10).astype(np.float64)

INSTANCES = [
    transforms.Identity(),
    transforms.Exp(),
    transforms.Log1pe(),
    transforms.Logistic(-2.0, 3.0),
]


def test_all_subclasses_covered():
    covered = {type(t) for t in INSTANCES}
    # LowerTriangular is matrix-shaped (vector -> [n,n,D]); it has its own
    # dedicated round-trip/grad tests below instead of the scalar loop
    covered |= {transforms.LowerTriangular}
    assert {c for c in transforms.Transform.__subclasses__()} == covered


@pytest.mark.parametrize("t", INSTANCES, ids=lambda t: str(t))
def test_forward_backward_roundtrip(t):
    y = t.forward(X)
    x2 = t.backward(y)
    np.testing.assert_allclose(x2, X, atol=1e-4)


@pytest.mark.parametrize("t", INSTANCES, ids=lambda t: str(t))
def test_tensor_forward_matches_numpy(t):
    yt = t.forward(ad.Tensor(X))
    y = t.forward(X)
    got = yt.data if isinstance(yt, ad.Tensor) else yt
    np.testing.assert_allclose(got, y, atol=1e-10)


@pytest.mark.parametrize("t", INSTANCES, ids=lambda t: str(t))
def test_log_jacobian_matches_finite_diff(t):
    # sum log |dy/dx| via per-element finite differences
    eps = 1e-6
    dydx = (t.forward(X + eps) - t.forward(X - eps)) / (2 * eps)
    expected = np.sum(np.log(np.abs(dydx)))
    lj = t.log_jacobian(X)
    got = float(lj.data) if isinstance(lj, ad.Tensor) else float(lj)
    np.testing.assert_allclose(got, expected, atol=1e-4)


@pytest.mark.parametrize("t", INSTANCES, ids=lambda t: str(t))
def test_log_jacobian_tensor_grad_exists(t):
    x = ad.Tensor(X, requires_grad=True)
    lj = t.log_jacobian(x)
    if isinstance(lj, ad.Tensor) and lj.requires_grad:
        lj.backward()
        assert x.grad is not None


def test_column_parity(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pd.DataFrame({"x": X}))
    for t in INSTANCES:
        out = df.select(
            t.forward(F.col("x")).alias("y"),
            (
                t.log_jacobian(F.col("x")) if not isinstance(t, transforms.Identity)
                else F.lit(0.0)
            ).alias("lj"),
        ).toPandas()
        np.testing.assert_allclose(out["y"].to_numpy(), t.forward(X), atol=1e-9)


def test_softplus_overflow_safe():
    t = transforms.Log1pe()
    big = np.array([1000.0, -1000.0])
    y = t.forward(big)
    assert np.isfinite(y).all()
    assert y[0] == pytest.approx(1000.0, rel=1e-9)


def test_vec_to_tri_round_trip_and_grad():
    """W4 vec_to_tri: pack/unpack identity + gradient through the
    constant-basis matmul (no custom scatter kernel needed)."""
    from henbun_spark import autodiff as ad
    from henbun_spark.utils import tri_to_vec, vec_to_tri

    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 6))  # 3 matrices of size 3x3
    tri = vec_to_tri(x)
    assert tri.shape == (3, 3, 3)
    assert np.allclose(np.triu(tri[0], k=1), 0.0)
    np.testing.assert_array_equal(tri_to_vec(tri), x)

    t = ad.Tensor(x, requires_grad=True)
    out = vec_to_tri(t)
    s = ad.sum(out)
    s.backward()
    np.testing.assert_array_equal(t.grad, np.ones_like(x))


def test_lower_triangular_transform():
    """T5 LowerTriangular: forward/backward round trip, reference output
    layout [n, n, D], autodiff forward == numpy forward."""
    from henbun_spark import autodiff as ad

    rng = np.random.default_rng(1)
    tr = transforms.LowerTriangular(num_matrices=2)
    x = rng.standard_normal(2 * 10)  # two 4x4 lower triangles
    y = tr.forward(x)
    assert y.shape == (4, 4, 2)
    np.testing.assert_array_equal(tr.backward(y), x)

    yt = tr.forward(ad.Tensor(x, requires_grad=True))
    np.testing.assert_array_equal(yt.data, y)

    sq = transforms.LowerTriangular(num_matrices=1, squeeze=True)
    y1 = sq.forward(rng.standard_normal(6))
    assert y1.shape == (3, 3)
    assert np.allclose(np.triu(y1, k=1), 0.0)
    assert tr.log_jacobian(x) == -np.inf
