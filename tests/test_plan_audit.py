"""In-suite physical-plan audit gate (round-5 hardening).

Round 4 shipped with `tools/explain_audit.py` red at HEAD (an
un-whitelisted BroadcastNestedLoopJoin in hard_negatives_emb) because the
gate only ran manually. This test runs the same audit over every
*plan-only* contract query at sf0.001 so a new CartesianProduct,
row-at-a-time BatchEvalPython, or un-whitelisted BNLJ fails the suite.

Queries that execute work at build time (training loops, streaming
drains, k-means fits) are skipped here for suite-speed; the full audit —
including those — remains `python tools/explain_audit.py` (documented as
a local gate in README.md) and is still the authority.
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
# audited by the standalone tool, skipped in-suite.
EAGER_PREFIXES = ("streaming_", "vi_", "gp_")
EAGER = {
    "kmeans_embeddings",
    "semantic_dedup_emb",
    "pca_embeddings",
    "bpe_train_encode",
    "logreg_quality_classifier",
    "ann_topk_ivf",
    "ann_topk_pq",
    "tdigest_quantiles_value",
    "mv_incremental_daily",
    "image_dedup_ahash",
    "audio_dedup_fp",
    "video_dedup_frames",
    "multimodal_features",
}


def _plan_only_names():
    return [
        n
        for n in entry_mod.queries()
        if not n.startswith(EAGER_PREFIXES) and n not in EAGER
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


def test_bnlj_whitelist_entries_still_exist():
    # A whitelist entry for a deleted query is a stale hole; every name in
    # BNLJ_OK must still be a registered contract query.
    qs = set(entry_mod.queries())
    stale = sorted(
        n
        for n in explain_audit.BNLJ_OK | explain_audit.PERCENTILE_OK
        if n not in qs
    )
    assert not stale, f"stale audit whitelist entries: {stale}"
