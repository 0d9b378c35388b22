"""Budgeted corpus selection: keep the best rows (by a score) until a
cumulative weight budget is exhausted — "take the highest-quality
documents until the token budget is spent", the final step of assembling
a training mix.

The naive formulation is a running sum over a GLOBAL ordering, which in
Spark means a window with no partition key — every row moves to ONE
reducer (the canonical scale failure). This module implements the
classic two-pass distributed prefix sum instead:

1. range-repartition on the ordering key (Spark's sampled range exchange
   — the same machinery behind a global sort, deterministic for a given
   input) and sort within partitions;
2. per-partition weight totals -> driver (one row per partition, tiny)
   -> exclusive prefix offsets per partition;
3. within-partition running sum (window PARTITIONED by the partition id
   — parallel) + broadcast offset = exact global running sum; filter to
   the budget.

Rows on the budget boundary: a row is kept iff its whole weight fits
(cum <= budget), matching the SQL oracle's cumulative-sum filter.
Ordering ties are broken by the id column so results are deterministic.

No reference analogue; part of the brief-mandated training-data-pipeline
surface (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["take_budget"]


def take_budget(
    df: DataFrame,
    score_col: str,
    weight_col: str,
    budget: int,
    id_col: str,
    n_partitions: int | None = None,
) -> DataFrame:
    """Rows with the highest `score_col` whose cumulative `weight_col`
    (in (score desc, id asc) order) stays within `budget`. Weights must
    be non-negative integers (token counts) so the running sum is exact.

    Output: the selected rows of `df` plus `cum_weight` (the running
    total INCLUDING the row)."""
    parted = df.repartitionByRange(
        *([n_partitions] if n_partitions else []),
        F.desc(score_col),
        F.asc(id_col),
    ).withColumn("_pid", F.spark_partition_id())

    # pass 1: per-partition totals -> exclusive prefix offsets (driver
    # sees one row per partition)
    totals = (
        parted.groupBy("_pid")
        .agg(F.sum(weight_col).alias("_w"))
        .collect()
    )
    offsets, acc = {}, 0
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["_w"]
    off_df = F.broadcast(
        parted.sparkSession.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
        )
    )

    # pass 2: parallel within-partition running sum + offset
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.desc(score_col), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        parted.join(off_df, "_pid")
        .withColumn(
            "cum_weight", F.sum(weight_col).over(w) + F.col("_off")
        )
        .where(F.col("cum_weight") <= budget)
        .drop("_pid", "_off")
    )
