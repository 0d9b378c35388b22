"""Sampling operators for training-data pipelines: deterministic
hash-based train/test split, per-group deterministic sampling, and
stratified random sampling.

The hash-based variants are pure Column md5 arithmetic — reproducible
across runs, engines, and cluster sizes (no RNG state, no partition
dependence), which is what a 100 TB pipeline needs for an auditable
split. This is the distributed answer to the reference's driver-side
`Indexer` 90/10 split (`/root/reference/Henbun/model.py:126-143`): the
reference draws random index permutations on one node; here membership
is a pure function of the row id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_bucket(col, salt: str, buckets: int = 100):
    """Deterministic bucket in [0, buckets): first 6 hex chars of
    md5(salt | value) as an integer, mod buckets. Portable to any engine
    with md5 + substring (the DuckDB oracle mirrors it with nibble
    arithmetic)."""
    h = F.md5(F.concat(F.lit(salt), F.lit("|"), col.cast("string")))
    return F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % buckets


def hash_split(
    df: DataFrame,
    id_col: str,
    test_pct: int = 10,
    salt: str = "split",
    out: str = "is_test",
) -> DataFrame:
    """Deterministic train/test split: a row is test iff its id's hash
    bucket < test_pct. Stable under repartitioning, retries, and data
    growth (new ids land in either side at the same rate)."""
    return df.withColumn(out, _hash_bucket(F.col(id_col), salt) < test_pct)


def deterministic_sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    k: int,
    salt: str = "sample",
    distributed_ranks: bool = False,
) -> DataFrame:
    """Exactly k rows per group, chosen by md5 order — a deterministic
    'reservoir': every run, engine, and cluster size picks the same rows.
    No RNG.

    ``distributed_ranks=False`` (default) uses the group window — right
    for HIGH-cardinality groups (user_id), where each group's partition
    is small. Set it True for LOW-cardinality groups (event_type, lang,
    source): the window would sort ~1/|groups| of the table in one
    task, so the rank comes from the md5-bucketed prefix count instead
    (order-aligned hash-prefix cells, in-plan offsets, no driver
    round-trip) — identical rows kept, bitwise. NULL group keys and
    NULL ids flow through both routes identically (null-safe offset
    join, nulls-first ordering); the one soft spot is SEVERAL NULL-id
    rows in one group — they tie on (md5, id), and tie order at the k
    boundary is arbitrary in either route."""
    h = F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string")))
    if distributed_ranks:
        from henbun_spark.operators import relational

        return (
            relational.md5_bucketed_prefix_sum(
                df.withColumn("__h", h),
                group_cols,
                "__h",
                id_col,
                None,
                out_name="__rn",
            )
            .where(F.col("__rn") <= k)
            .drop("__rn", "__h")
        )
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 0
) -> DataFrame:
    """Per-stratum Bernoulli sampling (`df.sampleBy`): classic class
    rebalancing. Random (partition-order dependent) — use the hash-based
    variants when reproducibility across runs matters more than exact
    randomness."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement via order
    statistics (Efraimidis & Spirakis 2006): each row draws a
    reproducible uniform u from md5(salt|id) and competes with key
    u^(1/w) — the global top-k keys are exactly a weighted sample. The
    plan is a map-only key computation + TakeOrdered(k): distributed,
    one pass, no per-group state, reproducible across engines and runs.

    Rows with weight <= 0 are excluded (zero chance mass). Ties are
    impossible up to md5 collisions. Output: input columns + sample_key.
    """
    h = F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string")))
    # 12 hex chars -> 48-bit uniform in (0, 1]; +1 avoids u=0
    u = (F.conv(F.substring(h, 1, 12), 16, 10).cast("double") + 1.0) / F.lit(
        float(1 << 48)
    )
    key = F.pow(u, 1.0 / F.col(weight_col))
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("sample_key", key)
        .orderBy(F.desc("sample_key"), F.col(id_col))
        .limit(k)
    )
