"""Time-series / hypertable dashboard slice: the continuous-aggregate
operator family on the events table, end to end.

1. OHLC candlesticks per hour (arg-min/arg-max open/close — one
   map-side-combinable aggregation, no window).
2. Per-user downsampled sparklines via parallel averaged-anchor LTTB
   (12 points per user that keep the series' visual shape).
3. Time-weighted averages (trapezoidal `time_weight`) — de-biased
   against irregular sampling.
4. Resets-aware counter increase (`counter_agg` / PromQL `increase()`).
5. Hourly gap-filled rollup with LOCF, and the streaming OHLC MV that
   keeps (1) fresh at ingest via exactly-once min/max struct merges.

Run: python examples/timeseries_dashboard.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from henbun_spark import sources, streaming
from henbun_spark.operators import relational


def batch_rollups(spark, sf_dir):
    """Run the five batch continuous-aggregate shapes; return the
    result frames keyed by name (all lazily planned)."""
    ev = sources.load_table(spark, sf_dir, "events")
    return {
        "ohlc": relational.ohlc_bucket(ev, "ts", "value", bucket_secs=3600),
        "lttb": relational.lttb_downsample(
            ev, "ts", "user_id", "value", buckets=12
        ),
        "twa": relational.time_weighted_avg(ev, "ts", "user_id", "value"),
        "counter": relational.counter_delta(ev, "ts", "user_id", "value"),
        "gapfill": relational.gapfill_locf(ev, "ts", "user_id", "value", 3600),
    }


def streaming_ohlc_matches_batch(spark, sf_dir, tmp_dir):
    """Drain the streaming OHLC MV over 4 micro-batches and count how
    many of its rows equal the batch rollup exactly. Returns
    (n_matching, n_total) — equal when the merge states are correct."""
    ev = sources.load_table(spark, sf_dir, "events")
    batch = relational.ohlc_bucket(ev, "ts", "value", bucket_secs=3600)
    src = ev.select("ts", "value")
    src.repartition(4).write.mode("overwrite").parquet(f"{tmp_dir}/in")
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp_dir}/in")
    )
    q = streaming.mv_stream_maintenance(
        stream,
        lambda d: relational.ohlc_partials(d, "ts", "value", 3600),
        ["bucket_epoch"],
        f"{tmp_dir}/state",
        f"{tmp_dir}/ckpt",
        agg_spec=relational.OHLC_MERGE_SPEC,
    )
    q.awaitTermination()
    mv = relational.ohlc_finalize(
        streaming.load_state(spark, f"{tmp_dir}/state")
    )
    n_match = mv.join(
        batch, ["bucket_epoch", "n_points", "open", "high", "low", "close"]
    ).count()
    return n_match, batch.count()


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = sources.get_spark(
        "timeseries-dashboard", master="local[4]", shuffle_partitions=8
    )
    frames = batch_rollups(spark, sf_dir)

    print("== hourly OHLC (first 5 buckets) ==")
    frames["ohlc"].orderBy("bucket_epoch").show(5)

    print("== LTTB 12-point sparklines (one user) ==")
    ev = sources.load_table(spark, sf_dir, "events")
    uid = ev.select(F.min("user_id")).first()[0]
    frames["lttb"].where(F.col("user_id") == uid).orderBy("bucket").show(12)

    print("== time-weighted averages vs plain AVG (5 users) ==")
    avg = ev.groupBy("user_id").agg(
        F.round(F.avg("value"), 6).alias("plain_avg")
    )
    frames["twa"].join(avg, "user_id").orderBy("user_id").show(5)

    print("== resets-aware counter increase (5 users) ==")
    frames["counter"].orderBy("user_id").show(5)

    print("== gap-filled hourly rollup with LOCF (one user, 8 buckets) ==")
    frames["gapfill"].where(F.col("user_id") == uid).orderBy(
        "bucket_epoch"
    ).show(8)

    print("== streaming OHLC MV == batch OHLC ==")
    with tempfile.TemporaryDirectory() as tmp:
        n_match, n_total = streaming_ohlc_matches_batch(spark, sf_dir, tmp)
        print(f"streamed MV rows matching batch OHLC exactly: {n_match}/{n_total}")


if __name__ == "__main__":
    main(*sys.argv[1:])
