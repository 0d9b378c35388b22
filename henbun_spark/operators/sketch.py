"""Mergeable frequency sketches as DataFrame operators.

The reference has no sketch surface (its data plane is dense numpy feeds,
`/root/reference/Henbun/param.py:676-739`); these are part of the
training-data-pipeline operator set: approximate frequency statistics whose
*state* is a small mergeable table instead of a full groupBy over a 100 TB
key space.

Count-min sketch (Cormode & Muthukrishnan 2005): a depth x width counter
matrix; every key increments one counter per row (bucket = hash_d(key) mod
width), and the frequency estimate is the MIN over the depth counters —
always >= the true count, with overestimate bounded by (e/width) * N at
confidence 1 - exp(-depth).

Scale design:
* Building the sketch is ONE explode(depth) + ONE map-side-combinable
  groupBy((d, bucket)) — the shuffle moves at most depth*width counter
  partials per map task regardless of input size. No distinct, no
  wide state.
* Sketches MERGE by counter addition (`cms_merge`), so per-day /
  per-source sketches roll up without touching raw data — the property
  that makes a sketch worth having at 100 TB.
* Hashing is md5-nibble arithmetic (same idiom as
  `text.hashed_features`), bit-portable across engines, so a DuckDB
  oracle can rebuild the identical counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(col, d: int, width: int, salt: str):
    """Deterministic bucket for hash row ``d``: first 6 md5 nibbles of
    ``salt|d|value`` mod width (engine-portable integer arithmetic)."""
    h = F.md5(
        F.concat(
            F.lit(salt), F.lit("|"), F.lit(str(d)), F.lit("|"),
            F.coalesce(col.cast("string"), F.lit("\x00")),
        )
    )
    return (F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % width).cast("int")


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Build a count-min sketch over ``df[key_col]``.

    Returns the counter table ``(d int, bucket int, cnt bigint)`` with at
    most depth*width rows. The explode multiplies rows by ``depth`` before
    the groupBy, but partial aggregation collapses each map task to <=
    depth*width partials, so shuffle volume is O(tasks * depth * width),
    independent of input row count.
    """
    key = F.col(key_col)
    pairs = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"), _bucket(key, d, width, salt).alias("bucket")
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width, salt) by counter
    addition — union + one re-aggregation over <= depth*width keys."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: re-hash each key
    to its depth buckets, join the counter table (depth*width rows —
    always broadcastable), take MIN(cnt).

    Missing counters count as 0 (key hashed to a bucket no row touched),
    so keys absent from the build data estimate 0, not null.
    """
    key = F.col(key_col)
    probes = keys.select(
        key.alias("key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(key, d, width, salt).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("p"),
    ).select("key", F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["d", "bucket"], "left").select(
        "key", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return joined.groupBy("key").agg(F.min("cnt").alias("est"))
