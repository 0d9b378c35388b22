"""Density parity — mirrors `/root/reference/testing/test_densities.py`
(scipy is unavailable here; references use math.lgamma-based closed forms,
equivalent to the scipy constructions the reference tests against).
"""

import math

import numpy as np
import pytest

from henbun_spark import autodiff as ad
from henbun_spark import densities

RNG = np.random.default_rng(0)


def ref_gaussian(x, mu, var):
    return -0.5 * np.log(2 * np.pi * var) - 0.5 * (x - mu) ** 2 / var


def ref_student_t(x, mean, scale, df):
    lg = np.vectorize(math.lgamma)
    return (
        lg((df + 1) / 2.0)
        - lg(df / 2.0)
        - 0.5 * (np.log(scale**2) + np.log(df) + np.log(np.pi))
        - 0.5 * (df + 1) * np.log(1 + (1.0 / df) * ((x - mean) / scale) ** 2)
    )


def test_gaussian():
    x = RNG.normal(size=50)
    np.testing.assert_allclose(
        densities.gaussian(x, 0.3, 2.0), ref_gaussian(x, 0.3, 2.0), atol=1e-10
    )


def test_lognormal():
    x = np.abs(RNG.normal(size=50)) + 0.1
    expected = ref_gaussian(np.log(x), 0.1, 1.5) - np.log(x)
    np.testing.assert_allclose(densities.lognormal(x, 0.1, 1.5), expected, atol=1e-10)


def test_bernoulli():
    p = RNG.uniform(0.01, 0.99, size=50)
    y = (RNG.uniform(size=50) > 0.5).astype(np.float64)
    expected = np.where(y == 1, np.log(p), np.log(1 - p))
    np.testing.assert_allclose(densities.bernoulli(p, y), expected, atol=1e-12)


def test_poisson():
    lamb = np.abs(RNG.normal(size=50)) + 0.5
    y = RNG.integers(0, 10, size=50).astype(np.float64)
    lg = np.vectorize(math.lgamma)
    expected = y * np.log(lamb) - lamb - lg(y + 1)
    np.testing.assert_allclose(densities.poisson(lamb, y), expected, atol=1e-9)


def test_exponential():
    lamb = np.abs(RNG.normal(size=50)) + 0.5
    y = np.abs(RNG.normal(size=50))
    np.testing.assert_allclose(
        densities.exponential(lamb, y), -y / lamb - np.log(lamb), atol=1e-12
    )


def test_gamma():
    shape, scale = 2.5, 1.3
    x = np.abs(RNG.normal(size=50)) + 0.1
    expected = (
        -shape * np.log(scale)
        - math.lgamma(shape)
        + (shape - 1) * np.log(x)
        - x / scale
    )
    np.testing.assert_allclose(densities.gamma(shape, scale, x), expected, atol=1e-9)


@pytest.mark.parametrize("df", [3.0, 10.5])
def test_student_t(df):
    x = RNG.normal(size=50) * 3
    np.testing.assert_allclose(
        densities.student_t(x, 0.5, 1.2, df), ref_student_t(x, 0.5, 1.2, df), atol=1e-9
    )


def test_beta():
    a, b = 2.0, 3.5
    y = RNG.uniform(0.01, 0.99, size=50)
    expected = (
        (a - 1) * np.log(y)
        + (b - 1) * np.log(1 - y)
        + math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
    )
    np.testing.assert_allclose(densities.beta(a, b, y), expected, atol=1e-9)


def test_laplace():
    y = RNG.normal(size=50)
    np.testing.assert_allclose(
        densities.laplace(0.3, 1.1, y), -np.abs(0.3 - y) / 1.1 - np.log(2.2), atol=1e-12
    )


def test_bimixture_vs_numpy_lse():
    """Mirrors `testing/test_densities.py:11-24`."""
    p0 = RNG.normal(size=50) - 2
    p1 = RNG.normal(size=50) - 1
    f = 0.3
    expected = np.log(f * np.exp(p0) + (1 - f) * np.exp(p1))
    np.testing.assert_allclose(densities.bimixture(f, p0, p1), expected, atol=1e-10)


def test_multivariate_normal():
    n = 6
    A = RNG.normal(size=(n, n))
    cov = A @ A.T + n * np.eye(n)
    L = np.linalg.cholesky(cov)
    x = RNG.normal(size=n)
    mu = RNG.normal(size=n)
    d = x - mu
    expected = (
        -0.5 * n * np.log(2 * np.pi)
        - 0.5 * np.log(np.linalg.det(cov))
        - 0.5 * d @ np.linalg.inv(cov) @ d
    )
    np.testing.assert_allclose(
        densities.multivariate_normal(x, mu, L), expected, atol=1e-8
    )


def test_tensor_mode_grads():
    """Densities trace through autodiff with correct gradients."""
    x = RNG.normal(size=20)
    mu = ad.Tensor(np.array(0.4), requires_grad=True)
    obj = ad.sum(densities.gaussian(x, mu, 2.0))
    obj.backward()
    expected = np.sum((x - 0.4) / 2.0)
    np.testing.assert_allclose(mu.grad, expected, atol=1e-9)


def test_column_parity(spark):
    """Column expressions match numpy for every density (the engine's
    scalar-function surface runs JVM-side)."""
    import pandas as pd
    from pyspark.sql import functions as F

    x = RNG.uniform(0.05, 0.95, size=200)
    df = spark.createDataFrame(pd.DataFrame({"x": x}))
    cases = {
        "gaussian": (densities.gaussian(F.col("x"), 0.3, 2.0), densities.gaussian(x, 0.3, 2.0)),
        "lognormal": (densities.lognormal(F.col("x"), 0.1, 1.5), densities.lognormal(x, 0.1, 1.5)),
        "poisson": (densities.poisson(F.col("x") + 1.0, 3.0), densities.poisson(x + 1.0, 3.0)),
        "student_t": (densities.student_t(F.col("x"), 0.5, 1.2, 3.0), densities.student_t(x, 0.5, 1.2, 3.0)),
        "beta": (densities.beta(2.0, 3.5, F.col("x")), densities.beta(2.0, 3.5, x)),
        "laplace": (densities.laplace(0.3, 1.1, F.col("x")), densities.laplace(0.3, 1.1, x)),
        "exponential": (densities.exponential(F.col("x") + 0.5, 1.0), densities.exponential(x + 0.5, 1.0)),
        "bimixture": (
            densities.bimixture(0.3, F.log(F.col("x")), F.log(1 - F.col("x"))),
            densities.bimixture(0.3, np.log(x), np.log(1 - x)),
        ),
    }
    exprs = [expr.alias(k) for k, (expr, _) in cases.items()]
    out = df.select(*exprs).toPandas()
    for k, (_, expected) in cases.items():
        np.testing.assert_allclose(
            out[k].to_numpy(), expected, atol=1e-7, err_msg=k
        )


def test_lgamma_column_matches_math(spark):
    """Pure-Column Lanczos lgamma (no Python worker) == math.lgamma to
    1e-12 relative, across the reflection boundary and the full positive
    range used by the densities."""
    import pandas as pd
    from pyspark.sql import functions as F

    from henbun_spark import densities

    xs = np.concatenate(
        [np.linspace(0.05, 0.45, 9), np.linspace(0.5, 50.0, 100)]
    )
    df = spark.createDataFrame(pd.DataFrame({"x": xs}))
    got = (
        df.select("x", densities.lgamma(F.col("x")).alias("lg"))
        .orderBy("x")
        .toPandas()
    )
    plan = got  # materialized above; now assert no Python eval in the plan
    expr_plan = df.select(densities.lgamma(F.col("x")))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in expr_plan
    expect = np.vectorize(math.lgamma)(np.sort(xs))
    np.testing.assert_allclose(got["lg"].to_numpy(), expect, rtol=1e-12, atol=1e-13)


def test_sql_function_registry_matches_column_api(spark):
    """Every hb_* SQL function evaluates bitwise-identical to its Column/
    numpy twin, and the call macro-expands into codegen (a constant call
    constant-folds — no Python eval, no UDF node in the plan)."""
    from pyspark.sql import functions as F

    from henbun_spark import densities, transforms
    from henbun_spark.sql_functions import register_sql_functions

    register_sql_functions(spark)
    row = spark.sql(
        "SELECT hb_gaussian(3.0D, 1.0D, 4.0D) AS g,"
        " hb_lognormal(3.0D, 0.0D, 1.0D) AS lnr,"
        " hb_bernoulli(0.3D, 1.0D) AS be,"
        " hb_exponential(2.0D, 1.0D) AS ex,"
        " hb_laplace(0.0D, 1.0D, 2.0D) AS la,"
        " hb_bimixture(0.4D, -1.0D, -2.0D) AS bi,"
        " hb_softplus(-3.0D) AS sp,"
        " hb_logistic(0.5D, 0.0D, 2.0D) AS lg,"
        " hb_clip(5.0D, 0.0D, 1.0D) AS cl"
    ).collect()[0]
    lit = F.lit
    col_row = spark.range(1).select(
        densities.gaussian(lit(3.0), lit(1.0), lit(4.0)).alias("g"),
        densities.lognormal(lit(3.0), lit(0.0), lit(1.0)).alias("lnr"),
        densities.bernoulli(lit(0.3), lit(1.0)).alias("be"),
        densities.exponential(lit(2.0), lit(1.0)).alias("ex"),
        densities.laplace(lit(0.0), lit(1.0), lit(2.0)).alias("la"),
        densities.bimixture(lit(0.4), lit(-1.0), lit(-2.0)).alias("bi"),
        transforms.Logistic(0.0, 2.0).forward(lit(0.5)).alias("lg"),
    ).collect()[0]
    for k in ["g", "lnr", "be", "ex", "la", "bi", "lg"]:
        assert row[k] == col_row[k], k  # bitwise: same engine, same ops
    assert row["cl"] == 1.0
    # and the numpy mode agrees to the last couple ulps (libm vs JVM ln)
    assert abs(row["g"] - float(densities.gaussian(3.0, 1.0, 4.0))) < 1e-14
    plan = (
        spark.sql("SELECT hb_gaussian(3.0D, 1.0D, 4.0D) AS g")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "UDF" not in plan
    assert "-2.112085713764618" in plan  # constant-folded to a literal


def test_sql_function_registry_idempotent_and_prefixable(spark):
    """Re-registration must be safe (CREATE OR REPLACE) and a custom
    prefix must not collide with the default namespace."""
    from henbun_spark.sql_functions import SQL_FUNCTIONS, register_sql_functions

    first = register_sql_functions(spark)
    second = register_sql_functions(spark)  # idempotent
    assert first == second and len(first) == len(SQL_FUNCTIONS)
    alt = register_sql_functions(spark, prefix="hbx_")
    assert all(n.startswith("hbx_") for n in alt)
    a, b = spark.sql(
        "SELECT hb_gaussian(1.0D, 0.0D, 1.0D) AS a,"
        " hbx_gaussian(1.0D, 0.0D, 1.0D) AS b"
    ).collect()[0]
    assert a == b
