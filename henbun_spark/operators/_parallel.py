"""Adaptive input-parallelism guard for fan-out-heavy operators.

Spark sizes scan partitions by input *bytes* (`spark.sql.files.
maxPartitionBytes`), which is right for scan-bound queries but wrong for
operators whose per-row work dwarfs the scan: a character-shingle explode
multiplies each document into ~|text| rows, and LSH bucketing folds
n_planes x dim multiply-adds per row. A small-file corpus (one ~30 MB
parquet file) lands in ONE scan partition, so the expensive stage runs on
one core of the whole cluster.

`ensure_parallelism` round-robin-repartitions the (narrow) input up to the
cluster's default parallelism — but only when the scan yields fewer
partitions than that, so at real scale (thousands of scan partitions on
100 TB) it is a plan no-op with zero added shuffle. The repartition moves
the *pre-explode* rows, i.e. the cheapest possible representation of the
data.

Row placement never affects results: every downstream operator here is
either per-row or keyed (groupBy/join), so the round-robin layout is
invisible to the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition `df` to the cluster's default parallelism iff its
    current plan yields fewer partitions. No-op (and no added shuffle)
    when the input is already wide enough — the common case at scale."""
    if df.isStreaming:  # micro-batch sizing is the scheduler's job
        return df
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if _plan_partitions(df) < target:
        return df.repartition(target)
    return df


def _plan_partitions(df: DataFrame) -> int:
    """Partition count of `df`'s physical plan, without building the
    Python-row conversion pipeline: `df.rdd` plans an extra
    `javaToPython` projection (deserializers, a second QueryExecution)
    just to count partitions, which is pure driver overhead in hot
    query-construction paths. The JVM QueryExecution's `toRdd` is the
    same RDD the DataFrame executes, planned once and cached on the
    QueryExecution. Falls back to `df.rdd` off classic PySpark."""
    try:
        return int(df._jdf.queryExecution().toRdd().getNumPartitions())
    except Exception:  # pragma: no cover - e.g. Spark Connect
        return df.rdd.getNumPartitions()
