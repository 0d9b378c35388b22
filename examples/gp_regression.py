"""Sparse-GP regression on a table — the reference's GaussianProcess
notebook lifecycle (`/root/reference/notebooks/GaussianProcess.ipynb`)
distributed: whitened variational posterior over inducing points,
trainable lengthscale, Gaussian likelihood, trained with the broadcast ->
mapInPandas -> treeAggregate loop. The analytic Normal KL enters once per
step through `global_objective`.

Run: python examples/gp_regression.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

import henbun_spark as hb
from henbun_spark import autodiff as ad
from henbun_spark import sources, variationals
from henbun_spark.gp import kernels
from henbun_spark.gp.gp import SparseGP
from henbun_spark.spark_exec import ColumnData, SparkTrainer


def main(sf_dir: str):
    spark = sources.get_spark("gp-example")
    ev = sources.load_table(spark, sf_dir, "events").select(
        (F.hour("ts").cast("double") / 24.0).alias("x"),
        (F.col("value") / 100.0).alias("y"),
    )
    z = np.linspace(0.0, 1.0, 8).reshape(-1, 1)

    class GPR(hb.Model):
        def setUp(self):
            self.x = ColumnData("x")
            self.y = ColumnData("y")
            self.gp = SparseGP(kernels.UnitRBF(), z)
            self.u = variationals.Normal(shape=[8], n_layers=[4])
            self.lnsig = hb.Variable([1], mean=float(np.log(0.5)), stddev=0.01)

        def local_objective(self):
            s = self.gp.samples(
                self.x.reshape((-1, 1)), self.u, q_shape="neglected"
            )  # [4, n] posterior samples
            var = ad.exp(self.lnsig * 2.0)
            lik = hb.densities.gaussian(self.y.reshape((1, -1)), s, var)
            return ad.sum(lik) / 4.0

        def global_objective(self):
            return -self.KL()

    m = GPR()
    tr = SparkTrainer(m, ev, optimizer=hb.Adam(learning_rate=0.05))
    tr.fit(maxiter=15)
    ls = float(np.asarray(m.gp.kern.lengthscales.value).ravel()[0])
    print(f"lengthscale = {ls:.3f}")
    print(f"ELBO trace (first -> last): {tr.history[0]:.1f} -> {tr.history[-1]:.1f}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
