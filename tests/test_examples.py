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
