"""In-suite physical-plan audit gate (round-5 hardening).

Round 4 shipped with `tools/explain_audit.py` red at HEAD (an
un-whitelisted BroadcastNestedLoopJoin in hard_negatives_emb) because the
gate only ran manually. This test runs the same audit over every
*plan-only* contract query at sf0.001 so a new CartesianProduct,
row-at-a-time BatchEvalPython, or un-whitelisted BNLJ fails the suite.

Queries that execute work at build time (training loops, streaming
drains, k-means fits) are audited by `test_plan_audit_eager_green`
below — parametrized per query so one training loop flagging doesn't
hide the rest (round-8 hardening: in r7 the standalone tool went red on
exactly the two queries this module skipped, so "skipped in-suite" must
never again mean "audited by nobody"). `python tools/explain_audit.py`
remains the one-shot local gate over the whole registry.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import __spark_entry__ as entry_mod
import explain_audit

# Eager at build time (training / streaming drains / driver-side fits):
# audited per-query by test_plan_audit_eager_green, skipped in the fast
# batch test. Membership was verified empirically in r8 (statusTracker
# job counts at build time, sf0.001): every name here runs >=1 Spark job
# at build; `audio_dedup_fp` and `multimodal_features` were removed
# because they build fully lazily (0 jobs) and belong in the fast batch.
EAGER_PREFIXES = ("streaming_", "vi_", "gp_")
EAGER = {
    "kmeans_embeddings",        # driver-side Lloyd's iterations
    "semantic_dedup_emb",       # k-means fit + in-cluster pair jobs
    "pca_embeddings",           # Gram-matrix collect for eigenvectors
    "bpe_train_encode",         # merge-rule training loop
    "logreg_quality_classifier",  # SGD epochs
    "ann_topk_ivf",             # coarse-centroid fit
    "ann_topk_pq",              # subspace-codebook fit
    "tdigest_quantiles_value",  # digest build (treeAggregate)
    "mv_incremental_daily",     # day-1 state materialization
    "image_dedup_ahash",        # decode-probe job
    "image_dedup_phash",        # decode-probe job
    "video_dedup_frames",       # decode-probe job
    "diverse_select_emb",       # k greedy rounds (TakeOrdered collects)
}


def _plan_only_names():
    return [
        n
        for n in entry_mod.queries()
        if not n.startswith(EAGER_PREFIXES) and n not in EAGER
    ]


def _eager_names():
    return [
        n
        for n in entry_mod.queries()
        if n.startswith(EAGER_PREFIXES) or n in EAGER
    ]


def test_plan_audit_green(spark, sf_dir):
    qs = entry_mod.queries()
    failures = []
    for name in _plan_only_names():
        try:
            plan = explain_audit.plan_of(qs[name](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — collect, report all at once
            failures.append(f"{name}: build error {exc}")
            continue
        hard = [
            f for f in explain_audit.audit(name, plan) if not f.startswith("warn:")
        ]
        if hard:
            failures.append(f"{name}: {hard}")
    assert not failures, "plan audit red at HEAD:\n" + "\n".join(failures)


@pytest.mark.parametrize("name", sorted(set(_eager_names())))
def test_plan_audit_eager_green(spark, sf_dir, name):
    """Audit the queries that execute work at build time (the r7 hole:
    the standalone tool was the only thing auditing these, and it wasn't
    being run). Parametrized so each training loop / streaming drain is
    its own test and a single flag names its query directly."""
    plan = explain_audit.plan_of(entry_mod.queries()[name](spark, sf_dir))
    hard = [f for f in explain_audit.audit(name, plan) if not f.startswith("warn:")]
    assert not hard, f"{name}: {hard}"


def test_eager_plus_plan_only_covers_registry():
    # The two audit tests must partition the registry exactly — a query
    # in neither set is audited by nobody (the r7 failure mode).
    qs = set(entry_mod.queries())
    both = set(_plan_only_names()) & set(_eager_names())
    neither = qs - set(_plan_only_names()) - set(_eager_names())
    assert not both and not neither, f"both={sorted(both)} neither={sorted(neither)}"
    # And every hand-listed EAGER name must still be a registered query.
    stale = sorted(n for n in EAGER if n not in qs)
    assert not stale, f"stale EAGER entries: {stale}"


def test_bnlj_whitelist_entries_still_exist():
    # A whitelist entry for a deleted query is a stale hole; every name in
    # BNLJ_OK must still be a registered contract query.
    qs = set(entry_mod.queries())
    stale = sorted(
        n
        for n in explain_audit.BNLJ_OK
        | explain_audit.PERCENTILE_OK
        | explain_audit.GLOBAL_WINDOW_OK
        if n not in qs
    )
    assert not stale, f"stale audit whitelist entries: {stale}"


def test_global_window_detector_flags_data_window(spark, sf_dir):
    """r9 (closing the r8 verdict's audit blind spot): a partition-less
    window over DATA — the single-reducer shape the binned-offset
    primitives exist to avoid — must hard-flag, while (a) the same
    window partitioned and (b) the bucket machineries' bounded
    __bin-ordered offsets windows must not."""
    from pyspark.sql import Window, functions as F

    from henbun_spark import sources

    ev = sources.load_table(spark, sf_dir, "events")

    bad = ev.withColumn(
        "ord", F.row_number().over(Window.orderBy("value", "event_id"))
    )
    flags = explain_audit.audit("synthetic", explain_audit.plan_of(bad))
    assert "global-window" in flags, flags

    good = ev.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("user_id").orderBy("ts")),
    )
    flags = explain_audit.audit("synthetic", explain_audit.plan_of(good))
    assert "global-window" not in flags, flags

    offsets = (
        ev.groupBy(F.floor(F.col("value") / 10).alias("__bin"))
        .agg(F.count(F.lit(1)).alias("__btot"))
        .withColumn(
            "__boff",
            F.sum("__btot").over(
                Window.orderBy("__bin").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
    )
    flags = explain_audit.audit("synthetic", explain_audit.plan_of(offsets))
    assert "global-window" not in flags, flags

    # and the whitelist suppresses the flag only for the named query
    flags = explain_audit.audit(
        "skew_report_events", explain_audit.plan_of(bad)
    )
    assert "global-window" not in flags, flags
