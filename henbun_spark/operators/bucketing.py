"""Bucketed-table layout: pay the join shuffle ONCE at write time.

The co-location strategy every large warehouse runs on (and the one scale
technique the brief names that pure per-query planning can't give you):
write both sides of a recurring join `bucketBy(n, key)` so rows with equal
join keys land in the same bucket file on both tables, and every later
join on that key is a SortMergeJoin with ZERO Exchange on either input —
the shuffle happened once, at layout time, instead of per query.  At
100 TB this converts the dominant repeated cost (re-shuffling the fact
table for every fact-dim-fact join) into a one-time layout write; it is
also the skew-stable choice, since bucket routing is a pure hash with no
runtime range sampling.

No reference analogue (the reference is a VI library with no storage
layer); part of the brief-mandated Spark-scale surface.

Mechanics worth knowing (encoded below, asserted by pytest):

* Spark's bucket routing is ``murmur3(key) pmod n`` — the SAME hash
  ``repartition(n, key)`` uses, so repartitioning by the bucket key
  before the write yields at most ONE file per bucket (each bucket's
  rows colocate in one task; a bucket NO key hashes to — possible when
  n_buckets exceeds the key's distinct hash images — writes no file at
  all, which the scan handles as an empty bucket).  One-file-per-
  nonempty-bucket keeps the scan's task count <= bucket count and makes
  the layout deterministic.
* The no-shuffle join requires equal bucket counts on the join key on
  both sides; ``hint("merge")`` pins SortMergeJoin so a small side
  doesn't broadcast away the demonstration (in production you'd LET it
  broadcast — bucketing matters when both sides are big).
* ``sortBy(key)`` makes each bucket file key-sorted; Spark >= 3.0 still
  inserts a (local, cheap) Sort above the scan by default
  (`spark.sql.legacy.bucketedTableScan.outputOrdering` governs reusing
  the file order) — the expensive thing being eliminated is the
  EXCHANGE, and that elimination is what the audit asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join"]


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Write ``df`` as an EXTERNAL parquet table bucketed (and by default
    per-bucket sorted) on ``bucket_col``, at most one file per bucket
    via the matching-hash repartition (empty buckets write no file —
    see the module doc).  ``path`` keeps the data out of the session's
    managed warehouse (scratch-friendly); ``mode("overwrite")`` makes
    re-layout idempotent."""
    w = (
        df.repartition(n_buckets, bucket_col)
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .option("path", path)
    )
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket keys with
    SortMergeJoin pinned (``hint("merge")``): equal bucket counts mean
    Catalyst plans the join with NO Exchange on either input — bucket i
    of the left joins bucket i of the right, task-local."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(
        right, left[left_key] == right[right_key], how
    )
