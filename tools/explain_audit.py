"""Physical-plan audit over every driver-contract query.

For each entry in `__spark_entry__.queries()`, builds the DataFrame at a
small SF (planning only — nothing is executed unless the query itself
executes eagerly, e.g. VI training) and scans `explain("formatted")`
output for scale red flags:

* ``CartesianProduct`` — unbounded cross join, never acceptable;
* ``BatchEvalPython`` — row-at-a-time Python UDF in the plan (the slow
  path; Arrow/pandas evals are fine);
* parquet scans with a `Filter` above them but no pushed filters.

Exit code 1 if any hard flag fires outside the whitelist. Run:
    python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from henbun_spark import sources

# BroadcastNestedLoopJoin is legitimate where the broadcast side is
# tiny/bounded, making fan-out linear in the big side:
#  - range_join_quantity: 3-row VALUES bracket table;
#  - sim_cosine_topk: a handful of broadcast query vectors vs all
#    embeddings — the optimal distributed plan for brute-force top-k;
#  - emb_near_dup: the documented exact O(n^2) baseline; its scale path
#    is the LSH-bucketed ann_topk_lsh (hash-join, audited separately).
# Flag it everywhere else.
#  - text_tfidf: the corpus-count N rides along as a broadcast 1-row
#    aggregate cross join — bounded by construction.
#  - lm_score_docs / lm_bigram_docs: same bounded 1-row cross join (the
#    corpus token total joined onto the vocab table).
#  - skew_report_events: the (total, n_keys) 1-row aggregate crossed
#    onto the top-k rows.
#  - emb_lsh_recall: three 1-row count aggregates crossed together to
#    form the single metric row.
#  - hll_distinct_users: the 1-row sketch estimate crossed with the
#    1-row exact-distinct aggregate to form the single output row.
#  - minhash_recall_docs: three 1-row count aggregates crossed together
#    to form the single recall-metric row (same shape as emb_lsh_recall).
#  - bloom_semi_lineitem: two 1-row count aggregates crossed to form the
#    single fp-measurement row.
#  - heavy_hitters_users: the 1-row total-count aggregate crossed onto
#    the (<= k-per-task) candidate counts for the n*k > N filter.
#  - mix_temperature_sources: the 1-row (W, N) normalization aggregate
#    crossed onto the per-source rate table (|sources| rows).
#  - assemble_training_corpus: contains the same bounded mixing
#    normalization cross join as mix_temperature_sources.
#  - streaming_heavy_hitters: same bounded verify shape as
#    heavy_hitters_users (1-row total crossed onto candidate counts).
#  - streaming_hll_users: 1-row sketch estimate crossed with the 1-row
#    exact-distinct aggregate (same shape as hll_distinct_users).
#  - tdigest_quantiles_value: the 5-row estimate table crossed with the
#    1-row exact-percentiles aggregate.
#  - streaming_tdigest_value: same bounded 5x1 estimate-vs-exact shape
#    as tdigest_quantiles_value (drained streaming state side).
#  - hard_negatives_emb: <=20 broadcast query vectors crossed onto one
#    corpus scan — the same bounded brute-force shape as sim_cosine_topk
#    (linear in the corpus; the query side is a filtered constant).
#  - dsir_select_docs: the 1-row totals-constant aggregate (log
#    (Tr+B)/(Tt+B)) crossed onto the per-doc weight aggregate — same
#    bounded 1-row-broadcast shape as lm_score_docs' totals.
#  - ann_topk_pq / ann_topk_ivf: the r7 oracle conversion added an
#    exact-top-3 payload via similarity.cosine_topk — <=5 broadcast
#    query vectors crossed onto one corpus scan, the identical bounded
#    brute-force shape already whitelisted for sim_cosine_topk and
#    hard_negatives_emb (linear in the corpus; the broadcast side is a
#    filtered constant). The ANN candidate path itself is hash-joined.
#  - streaming_ivf_ingest: the r8 oracle conversion gives it the SAME
#    exact-top-3 payload as ann_topk_ivf (<=5 broadcast query vectors
#    onto one corpus scan); the streamed index path is partition-pruned.
#  - semantic_dedup_emb: the r8 oracle conversion appends the 1-row
#    singleton-count aggregate onto the (bounded, 12-row) dup-component
#    table — the skew_report_events shape.
#  - emb_truncated_recall (r9): TWO of the sim_cosine_topk shapes —
#    the same <=5 broadcast query vectors crossed onto one corpus scan,
#    once per truncation width (d=16 prefix and the full d=64); linear
#    in the corpus, broadcast side a filtered constant.
BNLJ_OK = {
    "emb_truncated_recall",
    "semantic_dedup_emb",
    "ann_topk_pq",
    "ann_topk_ivf",
    "streaming_ivf_ingest",
    "dsir_select_docs",
    "hard_negatives_emb",
    "streaming_tdigest_value",
    "heavy_hitters_users",
    "mix_temperature_sources",
    "assemble_training_corpus",
    "streaming_heavy_hitters",
    "streaming_hll_users",
    "tdigest_quantiles_value",
    "range_join_quantity",
    "sim_cosine_topk",
    "emb_near_dup",
    "text_tfidf",
    "lm_score_docs",
    "lm_bigram_docs",
    "skew_report_events",
    "emb_lsh_recall",
    "hll_distinct_users",
    "minhash_recall_docs",
    "bloom_semi_lineitem",
    # 1-row broadcast cross joins only: the n_docs scalar riding the
    # TF-IDF weighting (same shape as text_tfidf) ...
    "related_docs_tfidf",
    # ... and the (est) x (exact_n) scalar pairing — both sides are
    # single-row aggregates
    "join_size_estimate_cms",
    # 1-row crosses of the three HLL estimates + the exact-intersect
    # scalar
    "hll_overlap_segments",
    # 1-row broadcast cross of the n_users scalar onto the |types|^2
    # pair counts
    "event_cooccurrence_pmi",
}
# Spark's EXACT `percentile()` aggregate buffers a value->count map per
# group in executor memory — unbounded in distinct values, an OOM shape
# on high-cardinality doubles at 100x. The scale paths are
# relational.keyed_percentiles_exact (exact, bounded) and the t-digest
# sketch. Allowed only where the exact builtin IS the point — the
# sketch-accuracy measurement queries, whose input is the single-digit-
# row estimate table joined against one bounded global aggregate:
PERCENTILE_OK = {
    "quantile_sketch_value",
    "tdigest_quantiles_value",
    "streaming_tdigest_value",
}
# Known low-cardinality columns of the test tables: a Window partitioned
# SOLELY by one of these funnels ~1/|values| of the table through one
# task at scale (the shape the keyed-rank/percentile primitives exist to
# avoid). Soft warn — bounded-frame windows (lag, rolling ROWS frames)
# over these keys are sometimes intentional; the hard gate is review.
LOWCARD_COLS = {
    "event_type",
    "source",
    "lang",
    "l_returnflag",
    "l_linestatus",
    "o_orderstatus",
    "o_orderpriority",
}
# Global (partition-less) windows move ALL their input through ONE task
# — the classic single-reducer scale killer the repo's binned-offset
# primitives exist to avoid. The ONLY legitimate shape is a window over
# one of the bucket machineries' bounded IN-PLAN tables (the offsets
# walk orders by the internal __bin/__bkt columns and its input is
# <= MAX_VALUE_BINS+1 rows per key by construction, fine at any scale)
# — detected structurally by those column names, not per query. Any
# OTHER partition-less window over data is a hard flag unless the query
# is whitelisted here with a row-bound justification:
#  - skew_report_events: the rank window runs AFTER orderBy+limit(10)
#    (plans as TakeOrderedAndProject), so its input is <= top_k rows by
#    construction — the comment in relational.skew_report documents the
#    ordering deliberately.
#  - quantile_sketch_value: the cumulative-count and quantile-pick
#    windows run over the AGGREGATED equi-width histogram (<= 256 bins
#    by construction), whose `bin` column is a plain output name, not
#    the machineries' __bin marker.
GLOBAL_WINDOW_OK: set[str] = {
    "skew_report_events",
    "quantile_sketch_value",
}
# These execute work at build time (training loops, streaming drains) —
# still audited, just slower to appear.
HARD = ("CartesianProduct", "BatchEvalPython")


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(name: str, plan: str) -> list[str]:
    flags = []
    for bad in HARD:
        if bad in plan:
            flags.append(bad)
    if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
        flags.append("BroadcastNestedLoopJoin")
    if re.search(r"\bpercentile\(", plan) and name not in PERCENTILE_OK:
        flags.append("buffering-percentile")
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        args = m.group(1)
        # Partition-less window: the FIRST spec argument is already a
        # SORT order (trailing ASC/DESC NULLS ...), i.e. the partition
        # column list is empty — Spark will move the window's ENTIRE
        # input through one task. Allowed only over the bucket
        # machineries' bounded in-plan offsets tables (__bin/__bkt/
        # __boff columns, <= MAX_VALUE_BINS+1 rows by construction) or
        # for queries whitelisted with a row-bound justification.
        first_arg = args.split(",", 1)[0].strip()
        if re.search(r" (ASC|DESC) NULLS (FIRST|LAST)$", first_arg) and not (
            "__bin" in args or "__bkt" in args or "__boff" in args
        ):
            if name not in GLOBAL_WINDOW_OK and "global-window" not in flags:
                flags.append("global-window")
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        args = m.group(1)
        first = re.match(r"(\w+)#", args)
        # windows over the bucket machineries' TINY aggregated offset
        # tables (ordered by the internal __bkt / __bin columns — 16^p
        # hash-prefix cells or sampled value bins per key) and the
        # within-CELL data windows (partitioned by key AND bucket, each
        # cell ~1/(|keys| x |bins|) of the data) are bounded by
        # construction — not the data-sized single-task shape this
        # warns about
        if (
            first
            and first.group(1) in LOWCARD_COLS
            and "__bkt" not in args
            and "__bin" not in args
        ):
            flags.append(f"warn:lowcard-window:{first.group(1)}")
            break
    # scan fed directly by a filter but nothing pushed down
    for m in re.finditer(r"PushedFilters: \[\]", plan):
        ctx = plan[max(0, m.start() - 400) : m.start()]
        if re.search(r"\(\d+\) Filter", plan[m.start() : m.start() + 2000]):
            # only warn — filters on computed columns can't push
            flags.append("warn:unpushed-filter-scan")
            break
    return flags


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = sources.get_spark("explain-audit")
    qs = entry_mod.queries()
    rc = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            plan = plan_of(fn(spark, sf_dir))
        except Exception as exc:
            print(f"ERR  {name}: {exc}")
            rc = 1
            continue
        flags = audit(name, plan)
        hard = [f for f in flags if not f.startswith("warn:")]
        if hard:
            rc = 1
        marker = "FLAG" if hard else ("warn" if flags else "ok  ")
        joins = sorted(
            set(re.findall(r"(\w*(?:HashJoin|MergeJoin|NestedLoopJoin))", plan))
        )
        pyevals = sorted(
            set(re.findall(r"(ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas\w*|BatchEvalPython)", plan))
        )
        nexch = len(re.findall(r"\(\d+\) Exchange", plan))
        parts = [f"exchanges={nexch}"]
        if joins:
            parts.append("joins=" + ",".join(joins))
        if pyevals:
            parts.append("py=" + ",".join(pyevals))
        if flags:
            parts.append("flags=" + ",".join(flags))
        print(f"{marker} {name}: " + " ".join(parts))
    spark.stop()
    print("AUDIT", "FAIL" if rc else "PASS")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
