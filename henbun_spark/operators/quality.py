"""Declarative data-quality validation: dbt-test-style constraint checks
as a SINGLE aggregation pass.

No reference analogue (SURVEY §2.11 pipeline tooling). Every rule that
can be expressed as a conditional count (not_null, range, accepted
values, regex) folds into ONE agg over the table — a 100 TB validation
suite costs one scan, not one job per rule. Uniqueness needs a distinct
count and rides the same agg (approximate=False -> exact two-phase
distinct aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Run constraint rules and return one row per rule:
    (rule, column, n_violations, passed).

    Rule dicts:
      {"check": "not_null",        "col": c}
      {"check": "unique",          "col": c}   # rows beyond first per dup key
      {"check": "range",           "col": c, "min": x, "max": y}
      {"check": "accepted_values", "col": c, "values": [...]}
      {"check": "regex",           "col": c, "pattern": r"..."}  # must fully match
    """
    aggs, meta = [], []
    for i, r in enumerate(rules):
        c, check = F.col(r["col"]), r["check"]
        if check == "not_null":
            bad = c.isNull()
        elif check == "unique":
            aggs.append(
                (F.count(c) - F.countDistinct(c)).alias(f"_v{i}")
            )
            meta.append((check, r["col"]))
            continue
        elif check == "range":
            bad = c.isNull() | (c < F.lit(r["min"])) | (c > F.lit(r["max"]))
        elif check == "accepted_values":
            bad = ~c.isin(list(r["values"])) | c.isNull()
        elif check == "regex":
            bad = c.isNull() | ~c.rlike(r["pattern"])
        else:
            raise ValueError(f"unknown check {check!r}")
        aggs.append(F.sum(bad.cast("long")).alias(f"_v{i}"))
        meta.append((check, r["col"]))
    row = df.agg(*aggs)
    stacked = ", ".join(
        f"'{chk}', '{col}', _v{i}" for i, (chk, col) in enumerate(meta)
    )
    return row.selectExpr(
        f"stack({len(meta)}, {stacked}) as (rule, column, n_violations)"
    ).select(
        "rule", "column", F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )
