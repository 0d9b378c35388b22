"""Quickstart: the three things a Henbun user does on day one, on Spark.

1. Train a probabilistic model on a table (the reference's
   `Henbun_structure` notebook lifecycle — Model/Variable/AutoOptimize —
   distributed: broadcast params -> mapInPandas grads -> treeAggregate ->
   driver Adam).
2. Score rows with the density/transform Column surface (pure codegen).
3. Run a corpus pipeline slice (dedup -> quality -> pack) on documents.

Run: python examples/quickstart.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import henbun_spark as hb
from henbun_spark import sources
from henbun_spark.spark_exec import ColumnData, SparkTrainer


def train_regression(spark, sf_dir):
    """value ~ a + b * hour with a Gaussian likelihood, trained on the
    cluster; only the 2-element gradient crosses to the driver per step."""
    ev = sources.load_table(spark, sf_dir, "events").select(
        F.hour("ts").cast("double").alias("x"), F.col("value").alias("y")
    )

    class Reg(hb.Model):
        def setUp(self):
            self.x = ColumnData("x")
            self.y = ColumnData("y")
            self.ab = hb.Variable([2])

        def local_objective(self):
            pred = self.ab[0] + self.ab[1] * self.x
            return hb.densities.gaussian(self.y, pred, 1.0)

    tr = SparkTrainer(Reg(), ev, optimizer=hb.Adam(learning_rate=0.05))
    tr.fit(maxiter=15)
    a, b = tr.model.ab.value
    print(f"fitted: value ≈ {a:.3f} + {b:.3f} * hour")
    return float(a), float(b)


def score_columns(spark, sf_dir):
    """Log-densities and bijectors as Column expressions — whole-stage
    codegen, zero Python workers. Also reachable from pure SQL via
    `sql_functions.register_sql_functions` (hb_gaussian, ...)."""
    li = sources.load_table(spark, sf_dir, "lineitem")
    scored = li.select(
        hb.densities.gaussian(F.col("l_quantity"), 25.0, 100.0).alias("logp"),
        hb.transforms.Log1pe().forward(F.col("l_discount") * 10.0).alias("sp"),
    ).agg(F.sum("logp").alias("sum_logp"), F.avg("sp").alias("avg_softplus"))
    row = scored.collect()[0]
    print(f"sum logp = {row['sum_logp']:.2f}  avg softplus = {row['avg_softplus']:.4f}")
    return row


def corpus_slice(spark, sf_dir):
    """A pipeline slice: exact dedup -> quality gate -> token budget."""
    from henbun_spark.operators import dedup, text

    docs = sources.load_table(spark, sf_dir, "documents")
    kept = dedup.exact_dedup(docs, ["text"], "doc_id")
    scored = text.quality_score(kept).where(F.col("quality") >= 0.5)
    n = scored.count()
    print(f"kept {n} high-quality unique docs of {docs.count()}")
    return n


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = sources.get_spark("quickstart")
    train_regression(spark, sf_dir)
    score_columns(spark, sf_dir)
    corpus_slice(spark, sf_dir)
    spark.stop()
