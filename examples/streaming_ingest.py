"""Continuous-ingest maintenance walkthrough — what a 100-TB pipeline
keeps CURRENT while a crawl streams in, without ever rescanning the
corpus (the foreachBatch maintenance family, `henbun_spark.streaming`):

* an exact-dedup index (md5 digest -> canonical id + copy count),
* a Bloom filter over ingested doc ids (the membership pre-filter a
  later join or re-crawl admission check probes), and
* a bottom-k priority sample (a stable uniform sample of everything
  seen so far, for eyeballing / profiling the growing corpus).

All three fold exactly-once through versioned snapshot state (replayed
batches skip by batch id; commits are atomic pointer flips), so the
drained states equal their one-shot batch twins bit-for-bit no matter
how the stream was micro-batched.

Run:  PYTHONPATH=/root/repo python examples/streaming_ingest.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def ingest_and_maintain(spark, rows: int = 2000, base: str | None = None):
    """Stream a deterministic synthetic corpus in 1-file micro-batches
    and maintain the three ingest states. Returns
    (n_dup_groups, n_sample, n_bloom_words)."""
    from henbun_spark import streaming
    from henbun_spark.sources import pydatasource

    pydatasource.register(spark)
    base = base or tempfile.mkdtemp(prefix="henbun_ingest_")
    docs = (
        spark.read.format("synthetic_docs")
        .option("rows", rows)
        .option("partitions", 4)
        .load()
        .select("doc_id", "text", "source")
    )
    in_dir = f"{base}/in"
    docs.repartition(4).write.mode("overwrite").parquet(in_dir)

    def stream():
        return (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )

    # 1. exact-dedup index: digest -> (canonical id, copy count)
    streaming.mv_stream_maintenance(
        stream().select("doc_id", "text"),
        lambda d: d.groupBy(F.md5("text").alias("digest")).agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        ),
        ["digest"],
        f"{base}/dedup_state",
        f"{base}/dedup_ckpt",
        agg_spec={"canonical_id": "min"},
    ).awaitTermination()

    # 2. Bloom filter over ingested ids (membership pre-filter)
    streaming.bloom_stream_maintenance(
        stream().select("doc_id"),
        "doc_id",
        f"{base}/bloom_state",
        f"{base}/bloom_ckpt",
        m_bits=1 << 14,
        k=4,
    ).awaitTermination()

    # 3. bottom-k priority sample of the corpus-so-far
    streaming.bottomk_stream_maintenance(
        stream(),
        "doc_id",
        f"{base}/sample_state",
        f"{base}/sample_ckpt",
        k=25,
        payload_cols=("source",),
    ).awaitTermination()

    dups = streaming.load_state(spark, f"{base}/dedup_state").where(
        F.col("n_copies") > 1
    )
    sample = streaming.load_state(spark, f"{base}/sample_state")
    bloom = streaming.load_state(spark, f"{base}/bloom_state")
    return dups.count(), sample.count(), bloom.count(), base


def admission_check(spark, base: str, candidate_ids: list[int]):
    """Probe the maintained Bloom filter the way a re-crawl admission
    gate would: ids that MIGHT already be ingested (all k bits set)
    come back; definite newcomers are admitted without any corpus
    scan. Returns the maybe-seen id set."""
    from henbun_spark import streaming
    from henbun_spark.operators import sketch

    bloom = streaming.load_state(spark, f"{base}/bloom_state")
    probe = spark.createDataFrame(
        [(int(i),) for i in candidate_ids], "doc_id: long"
    )
    passed = sketch.bloom_filter_probe(
        probe, bloom, "doc_id", m_bits=1 << 14, k=4
    )
    return {r["doc_id"] for r in passed.collect()}


if __name__ == "__main__":
    from henbun_spark import sources

    spark = sources.get_spark("streaming-ingest-example", master="local[4]")
    n_dups, n_sample, n_words, base = ingest_and_maintain(spark, rows=2000)
    print(f"dup groups: {n_dups}, sample rows: {n_sample}, bloom words: {n_words}")
    maybe = admission_check(spark, base, [0, 1, 10**9])
    print(f"maybe-seen of [0, 1, 10^9]: {sorted(maybe)}")
