"""Physical-layout operators: Z-order (Morton) clustering for
multi-dimensional data skipping — the `OPTIMIZE ZORDER BY` pattern of
Delta/Iceberg, built from pure Column bit math plus Spark's native
range-partitioned sorted write.

Why it matters at 100 TB: parquet readers prune files and row groups by
min/max statistics. A table sorted on one key skips well on that key
only; interleaving the bits of k keys into one Morton code and sorting
on THAT gives every participating key locality, so selective filters on
any of them prune most files. The computation is map-only (zero
shuffles); the write's `repartitionByRange` is the one necessary
shuffle, and it doubles as the global sort.

No reference analogue (the reference is a VI library; layout is part of
the brief's 100 TB stance).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_value", "zorder_sql", "write_zordered"]


def zorder_value(cols: list[str | Column], bits: int = 16) -> Column:
    """Morton code interleaving the low `bits` bits of each column
    (callers pre-normalize to non-negative ints; values above 2^bits-1
    are clamped so outliers don't wrap). Pure Column arithmetic —
    whole-stage codegen, no UDF.

    Bit layout: output bit (j * k + i) = bit j of column i, so columns
    alternate significance — the standard Z-curve.
    """
    k = len(cols)
    capped = [
        F.least(
            F.greatest(F.col(c).cast("long") if isinstance(c, str) else c.cast("long"), F.lit(0)),
            F.lit((1 << bits) - 1),
        )
        for c in cols
    ]
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, c in enumerate(capped):
            z = z + F.shiftleft(
                F.shiftright(c, j).bitwiseAND(F.lit(1)), j * k + i
            )
    return z


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """DuckDB twin of `zorder_value` (oracle mirroring)."""
    k = len(cols)
    capped = [
        f"least(greatest(CAST({c} AS BIGINT), 0), {(1 << bits) - 1})"
        for c in cols
    ]
    terms = [
        f"((({c} >> {j}) & 1) << {j * k + i})"
        for j in range(bits)
        for i, c in enumerate(capped)
    ]
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int | None = None,
) -> None:
    """Write parquet clustered on the Z-curve of `cols`: compute the
    Morton code, range-partition on it (the one shuffle — also the
    global sort), sort within partitions, drop the helper column.
    Each output file then covers a compact hyper-rectangle of the key
    space, so min/max pruning works for filters on ANY of `cols`."""
    z = df.withColumn("__z", zorder_value(cols, bits))
    if n_files:
        z = z.repartitionByRange(n_files, "__z")
    else:
        z = z.repartitionByRange("__z")
    z.sortWithinPartitions("__z").drop("__z").write.mode("overwrite").parquet(
        path
    )
