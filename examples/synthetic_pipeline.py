"""End-to-end corpus pipeline on the custom `synthetic_docs` source —
no input files at all: generate a deterministic corpus on the executors,
dedup it, quality-filter it, split it, audit the split for near-dup
leakage, and pack the train side into training sequences.

Run:  PYTHONPATH=/root/repo python examples/synthetic_pipeline.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_corpus(spark, rows: int = 5000):
    """Generate -> exact-dedup -> quality-gate -> pack. Returns
    (n_generated, n_after_dedup, n_quality, n_packed_sequences)."""
    from henbun_spark.operators import dedup, pipeline, text
    from henbun_spark.sources import pydatasource

    pydatasource.register(spark)
    docs = (
        spark.read.format("synthetic_docs")
        .option("rows", rows)
        .option("partitions", 8)
        .load()
    )
    n_gen = docs.count()

    # exact dedup on normalized text (the generator plants ~3% dups);
    # the group table carries only (id, hash, keep) — join the kept ids
    # back onto the corpus for the payload columns
    kept = (
        dedup.normalized_dup_groups(docs, "text", "doc_id")
        .where(F.col("keep"))
        .select("doc_id")
    )
    deduped = docs.join(kept, "doc_id")
    n_dedup = deduped.count()

    # quality gate: token-count floor via the token-stats operator
    good = text.token_stats(
        deduped.select("doc_id", "text", "source"), "text"
    ).where(F.col("n_tokens") >= 30)
    n_quality = good.count()

    # next-fit packing into 512-token training sequences per source shard
    packed = pipeline.pack_sequences(
        good.select("doc_id", "source", F.col("n_tokens").cast("long").alias("tok")),
        "doc_id",
        "tok",
        budget=512,
        part_col="source",
    )
    n_seqs = packed.select("source", "bin").distinct().count()
    return n_gen, n_dedup, n_quality, n_seqs


def split_and_audit(spark, rows: int = 5000):
    """The benchmark-integrity tail of the pipeline: deterministic 90/10
    hash split + cross-split near-dup LEAKAGE audit (a train doc
    near-duplicating a held-out doc leaks the eval set into training —
    the same composition as the `split_leakage_report` contract query).
    Returns (n_train, n_eval, n_crossing_pairs)."""
    from henbun_spark.operators import dedup, sampling
    from henbun_spark.sources import pydatasource

    pydatasource.register(spark)
    docs = (
        spark.read.format("synthetic_docs")
        .option("rows", rows)
        .option("partitions", 8)
        .load()
    )
    flags = sampling.hash_split(docs, "doc_id", test_pct=10)
    n_eval = flags.where(F.col("is_test")).count()
    n_train = flags.count() - n_eval
    pairs = dedup.minhash_lsh_pairs(docs, "text", "doc_id", n=8, bands=4)
    crossing = (
        pairs.join(
            flags.select(F.col("doc_id").alias("id_a"), F.col("is_test").alias("ta")),
            "id_a",
        )
        .join(
            flags.select(F.col("doc_id").alias("id_b"), F.col("is_test").alias("tb")),
            "id_b",
        )
        .where(F.col("ta") != F.col("tb"))
        .count()
    )
    return n_train, n_eval, crossing


def pick_review_exemplars(spark, rows: int = 5000, k: int = 8):
    """Diversity stage (r8): hash-featurize each doc into a small stats
    vector and greedy-k-center select k maximally spread exemplars —
    the "what should a human look at first" / seed-annotation sampler
    (`selection.kcenter_select`, the same operator behind the
    `diverse_select_emb` contract query). Returns the selected doc_ids
    in pick order."""
    from henbun_spark.operators import selection, text
    from henbun_spark.sources import pydatasource

    pydatasource.register(spark)
    docs = (
        spark.read.format("synthetic_docs")
        .option("rows", rows)
        .option("partitions", 8)
        .load()
    )
    stats = text.token_stats(docs.select("doc_id", "text"), "text")
    feats = stats.select(
        "doc_id",
        F.array(
            F.least(F.col("n_tokens") / 200.0, F.lit(2.0)),
            F.col("avg_token_len").cast("double"),
            (F.col("n_distinct_tokens")
             / F.greatest(F.col("n_tokens"), F.lit(1))).cast("double"),
        ).alias("fv"),
    )
    picks = selection.kcenter_select(feats, "fv", "doc_id", k=k)
    return [r["doc_id"] for r in picks.orderBy("rank").collect()]


if __name__ == "__main__":
    from henbun_spark import sources

    spark = sources.get_spark("synthetic-pipeline", master="local[4]")
    print(build_corpus(spark))
    print(pick_review_exemplars(spark))
