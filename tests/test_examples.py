"""The examples/ scripts are the repo's notebook analogue (the reference
ships notebooks as its user-facing entry) — keep them runnable."""

import sys

sys.path.insert(0, "/root/repo/examples")


def test_quickstart_functions(spark, sf_dir):
    import quickstart

    a, b = quickstart.train_regression(spark, sf_dir)
    assert abs(a) < 100 and abs(b) < 100  # converged to finite params
    row = quickstart.score_columns(spark, sf_dir)
    assert row["sum_logp"] < 0  # log-densities are negative
    assert quickstart.corpus_slice(spark, sf_dir) > 0


def test_synthetic_pipeline(spark):
    import synthetic_pipeline

    n_gen, n_dedup, n_quality, n_seqs = synthetic_pipeline.build_corpus(
        spark, rows=2000
    )
    assert n_gen == 2000
    assert 0 < n_dedup < n_gen  # planted duplicates removed
    assert 0 < n_quality <= n_dedup
    assert 0 < n_seqs < n_quality  # packing coalesces docs into sequences

    n_train, n_eval, crossing = synthetic_pipeline.split_and_audit(
        spark, rows=2000
    )
    assert n_train + n_eval == 2000
    assert 0 < n_eval < n_train  # ~10% held out
    # the generator plants ~3% duplicates and the split ignores content,
    # so SOME duplicate pairs must cross the split — the audit's reason
    # to exist
    assert crossing > 0

    picks = synthetic_pipeline.pick_review_exemplars(spark, rows=2000, k=5)
    assert len(picks) == 5 and len(set(picks)) == 5  # k distinct exemplars


def test_timeseries_dashboard(spark, sf_dir, tmp_path):
    import timeseries_dashboard as tsd

    frames = tsd.batch_rollups(spark, sf_dir)
    ohlc = frames["ohlc"].collect()
    assert ohlc and all(
        r["low"] <= r["open"] <= r["high"]
        and r["low"] <= r["close"] <= r["high"]
        for r in ohlc
    )
    lttb = frames["lttb"].groupBy("user_id").count().collect()
    assert lttb and all(r["count"] <= 12 for r in lttb)
    twa = frames["twa"].collect()
    assert twa and all(r["span_secs"] > 0 for r in twa)
    counter = frames["counter"].collect()
    assert counter and all(r["total_increase"] >= 0 for r in counter)

    n_match, n_total = tsd.streaming_ohlc_matches_batch(
        spark, sf_dir, str(tmp_path / "sohlc")
    )
    assert n_total > 0 and n_match == n_total


def test_streaming_ingest(spark, tmp_path):
    import streaming_ingest

    n_dups, n_sample, n_words, base = streaming_ingest.ingest_and_maintain(
        spark, rows=2000, base=str(tmp_path)
    )
    assert n_dups > 0  # the generator plants ~3% duplicates
    assert n_sample == 25
    assert 0 < n_words <= (1 << 14) // 32
    # ingested ids must pass the admission probe (no false negatives);
    # a far-out id is overwhelmingly likely to be admitted as new
    maybe = streaming_ingest.admission_check(spark, base, [0, 1, 10**9])
    assert {0, 1} <= maybe
