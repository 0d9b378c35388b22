"""Bound-boolean margin sweep (the r9 verdict's fragility audit): run
every *_ok bound-boolean conversion query at sf0.01 with the entry
module's bound recorder enabled and print one line per bound —
(query, bound, measured statistic, limit, direction, step, margin in
discrete steps where the statistic is discrete).

A bound within <2 discrete steps of its measurement is FLAGGED: one
unlucky draw/rounding step would flip the driver-visible boolean (the
class the r8 advisor caught on streaming_ivf_ingest's recall bound).
Continuous statistics (fit errors, ELBO deltas, sigma units) print
their raw margin and a limit/stat ratio instead.

Usage: python tools/bound_margins.py [sf_dir]
Exit 1 if any discrete bound has <2 steps of margin.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from henbun_spark import sources
from henbun_spark.operators import relational

BOUND_QUERIES = [
    "vi_linear_regression",
    "vi_minibatch_sgd",
    "vi_staged_training",
    "streaming_vi_training",
    "vi_amortized_encoder",
    "gp_regression_events",
    "gp_experts_events",
    "gp_sparse_posterior",
    "logreg_quality_classifier",
    "ann_topk_ivf",
    "ann_topk_pq",
    "streaming_ivf_ingest",
    "approx_distinct_events",
    "tdigest_quantiles_value",
    "tdigest_by_type",
    "streaming_tdigest_value",
]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = sources.get_spark("bound-margins")
    entry_mod._RECORD_BOUNDS = True
    entry_mod._BOUND_LOG.clear()
    qs = entry_mod.queries()
    for name in BOUND_QUERIES:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        relational.release_scaffold_caches()
    entry_mod._RECORD_BOUNDS = False

    print(f"# bound margins at {sf_dir}")
    print("| query | bound | stat | limit | dir | step | margin (steps) |")
    print("|---|---|---|---|---|---|---|")
    fragile = []
    for e in entry_mod._BOUND_LOG:
        if e["dir"] in ("<=", "<"):
            margin = e["limit"] - e["stat"]
        else:
            margin = e["stat"] - e["limit"]
        if e["step"]:
            steps = margin / e["step"]
            steps_s = f"{steps:.1f}"
            if steps < 2.0:
                fragile.append((e["query"], e["bound"], steps))
        else:
            ratio = (
                abs(e["limit"] / e["stat"])
                if e["stat"] not in (0.0,)
                else float("inf")
            )
            steps_s = f"cont. (margin {margin:.4g}, limit/stat {ratio:.2g})"
        step_s = "-" if e["step"] is None else f"{e['step']:.4g}"
        print(
            f"| {e['query']} | {e['bound']} | {e['stat']:.4g} |"
            f" {e['limit']:.4g} | {e['dir']} | {step_s} | {steps_s} |"
        )
    if fragile:
        print("\nFRAGILE (<2 discrete steps of margin):")
        for q, b, st in fragile:
            print(f"  {q}.{b}: {st:.1f} steps")
        return 1
    print("\nall discrete bounds have >=2 steps of margin")
    return 0


if __name__ == "__main__":
    sys.exit(main())
