"""Driver-contract smoke tests: entry(), queries()/oracle_sql() consistency,
and a fast q1-vs-DuckDB check at sf0.001 (the full 30-query sweep lives in
tools/check_oracle.py and runs at sf0.01)."""

import duckdb
import numpy as np
import pytest

import __spark_entry__ as entry_mod
from henbun_spark import sources

ROWS_ONLY = {
    "vi_linear_regression",
    "vi_minibatch_sgd",
    "logreg_quality_classifier",
    "streaming_vi_training",
    "gp_sparse_posterior",
    "gp_regression_events",
    "gp_experts_events",
    "vi_staged_training",
    "multimodal_features",
    "ann_topk_ivf",
    "ann_topk_pq",
    "video_dedup_frames",
    "tdigest_quantiles_value",
    "tdigest_by_type",
    "streaming_tdigest_value",
    "streaming_ivf_ingest",
    "approx_distinct_events",
    "kmeans_embeddings",
    "pca_embeddings",
    "bpe_train_encode",
    "vi_amortized_encoder",
    "image_dedup_ahash",
    "image_dedup_phash",
    "audio_dedup_fp",
    "semantic_dedup_emb",
}


def test_approx_distinct_events_tracks_exact(spark, sf_dir):
    """The rows-only contract query carries its own ground truth: the HLL
    estimate must stay within the configured 2% rsd (5% slack) of the
    exact countDistinct computed in the same row."""
    rows = entry_mod.queries()["approx_distinct_events"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r["approx_users"] - r["exact_users"]) <= max(
            0.05 * r["exact_users"], 2
        ), r


def test_query_oracle_keys_consistent():
    qs = set(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    assert oracles <= qs
    assert qs - oracles == ROWS_ONLY


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_approx_count_distinct_within_5pct(spark, sf_dir):
    """approx_count_distinct (HLL++ sketch) tracks the exact distinct count
    — sketches can't hash-match a SQL oracle, so the contract query is the
    exact COUNT(DISTINCT) twin and this bounds the approximate path."""
    from pyspark.sql import functions as F

    li = sources.load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx"),
        F.countDistinct("l_orderkey").alias("exact"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= 0.05 * row["exact"], row


def test_q1_matches_duckdb_sf0001(spark, sf_dir):
    got = (
        entry_mod.q1_pricing_summary(spark, sf_dir)
        .orderBy("l_returnflag", "l_linestatus")
        .toPandas()
    )
    con = duckdb.connect()
    for t in sources.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    exp = (
        con.sql(entry_mod.oracle_sql()["q1_pricing_summary"])
        .df()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in ["sum_qty", "sum_disc_price", "sum_charge", "avg_qty"]:
        np.testing.assert_array_equal(got[c].to_numpy(), exp[c].to_numpy())


def test_readme_counts_match_registry():
    import re

    readme = open("/root/repo/README.md").read()
    m = re.search(r"exposes (\d+) queries \((\d+) hash-checked", readme)
    assert m, "README contract sentence missing"
    assert int(m.group(1)) == len(entry_mod.queries())
    assert int(m.group(2)) == len(entry_mod.oracle_sql())
    b = re.search(r"`bench\.py` times the (\d+)-query", readme)
    import bench

    assert b and int(b.group(1)) == len(bench.HEADLINE)


def test_bench_stdout_line_fits_driver_capture():
    """Round 4's official bench signal was lost because the stdout JSON
    outgrew the driver's ~2000-char tail capture. Guard: for the full
    current HEADLINE (worst-case long names, 4-digit times) the compact
    line parses as JSON and stays under 1900 chars."""
    import json as _json

    import bench

    times = {n: 123.456 for n in bench.HEADLINE}
    times[bench.HEADLINE[0]] = -1.0  # a failed query still fits
    full, line = bench.format_output(times, 0.1)
    assert len(line) <= 1900
    d = _json.loads(line)
    assert d["metric"] == "headline_suite_total"
    assert d["n_queries"] == len(bench.HEADLINE)
    assert d["n_failed"] == 1
    assert 0 < len(d["queries"]) <= 20
    assert full["queries"] == times


def test_driver_sampled_window_rotation_invariant():
    """The driver checks the FIRST 50 registry entries each round
    (hash vs DuckDB when an oracle exists, rows-only otherwise). The
    window is a scarce resource, so the invariant is: a ROWS-ONLY query
    may hold a window slot only while it has NEVER had a driver row in
    any committed CORRECTNESS_r*.json — first-time coverage beats a
    repeat hash-check; once covered, oracle-backed queries reclaim the
    slot next rotation."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            seen |= set(json.load(f))
    window = list(entry_mod.queries())[:50]
    oracles = entry_mod.oracle_sql()
    stale_rows_only = [n for n in window if n not in oracles and n in seen]
    assert not stale_rows_only, (
        "already-driver-checked rows-only queries waste window slots: "
        f"{stale_rows_only}"
    )
