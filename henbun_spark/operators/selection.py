"""Budgeted corpus selection: keep the best rows (by a score) until a
cumulative weight budget is exhausted — "take the highest-quality
documents until the token budget is spent", the final step of assembling
a training mix.

The naive formulation is a running sum over a GLOBAL ordering, which in
Spark means a window with no partition key — every row moves to ONE
reducer (the canonical scale failure). The running sum comes from
`relational.binned_prefix_sum` (r6): sampled equi-depth score bins ->
map-side per-bin weight totals -> IN-PLAN exclusive bin offsets ->
within-bin running sum. One data shuffle, no driver round-trip, and —
unlike the earlier two-pass range-partition form — nothing that
executes the same shuffle in two jobs (whose independently re-sampled
range boundaries had to agree for the offsets to line up).

Rows on the budget boundary: a row is kept iff its whole weight fits
(cum <= budget), matching the SQL oracle's cumulative-sum filter.
Ordering ties are broken by the id column so results are deterministic.

No reference analogue; part of the brief-mandated training-data-pipeline
surface (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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

    BREAKING (r6): a fractional weight column now raises ValueError (it
    previously went through a float window sum whose result depended on
    row grouping) — pre-cast integral-valued floats, e.g.
    ``df.withColumn(w, F.col(w).cast("long"))``, after checking they
    are whole numbers.

    Output: the selected rows of `df` plus `cum_weight` (the running
    total INCLUDING the row)."""
    from henbun_spark.operators import relational

    out = relational.binned_prefix_sum(
        df,
        [],
        score_col,
        [id_col],
        weight_col,
        out_name="cum_weight",
        descending=True,
        n_bins=n_partitions,
        inclusive=True,
    )
    return out.where(F.col("cum_weight") <= budget)
