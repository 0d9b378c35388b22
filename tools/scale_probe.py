"""Scaling-curve probe: time selected contract queries at every testdata
SF and report the growth exponent — the empirical check behind the 100 TB
claims (a plan that survives scale shows time growing ~linearly in input
size; a quadratic candidate-generation or driver-collect bottleneck shows
up as an exponent near 2 between sf0.01 and sf0.1).

Each query runs twice per SF and keeps the better time (absorbs JVM/
codegen warmup). Exponent = log(t_hi/t_lo) / log(10) between adjacent
SFs (testdata SFs are decades apart).

Usage: python tools/scale_probe.py [query ...]   (default: heavy set)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from henbun_spark import sources

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

DEFAULT = [
    "q1_pricing_summary",
    "q3_top_orders",
    "dedup_minhash_lsh",
    "dedup_jaccard",
    "dedup_components",
    "simhash_near_pairs",
    "emb_near_dup_lsh",
    "chunk_dedup_docs",
    "lm_score_docs",
    "gapfill_hourly_locf",
    "gapfill_hourly_interp",
    "bpe_train_encode",
    "sessionize_events",
    "heavy_hitters_users",
    "boilerplate_chunks_docs",
    "assemble_training_corpus",
    # round-5 scale-path queries (keyed ranks / percentiles / prefix sums)
    "equidepth_histogram",
    "rank_gauss_value",
    "percentile_quantity",
    "anomaly_mad_events",
    "winsorize_value_by_type",
    "weighted_percentile_price",
    "cap_docs_per_source",
    "upsample_epochs_sources",
    "pack_materialize_docs",
    "sample_per_group",
]


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    names = sys.argv[1:] or DEFAULT
    spark = sources.get_spark("henbun-scale-probe")
    qs = entry_mod.queries()
    print(f"{'query':28s} " + " ".join(f"{os.path.basename(s):>9s}" for s in SFS) + "  exp(0.01->0.1)")
    for name in names:
        times = []
        for sf_dir in SFS:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                force(qs[name](spark, sf_dir))
                best = min(best, time.time() - t0)
            times.append(best)
        exp = math.log(times[2] / times[1]) / math.log(10) if times[1] > 0 else float("nan")
        print(
            f"{name:28s} " + " ".join(f"{t:9.2f}" for t in times) + f"  {exp:+.2f}"
        )


if __name__ == "__main__":
    main()
