"""Pre-1970 timestamp twins: every time-bucketing query must agree with
its DuckDB oracle on NEGATIVE epochs (the r11 advisor caught `// 3600`
truncating toward zero where DuckDB floors — truncate and floor differ
exactly on negative operands, which no driver SF exercises because the
testdata starts at 1995).

The fixture is a doctored sf-directory: sf0.001 with
* events REPLACED by a tiny corpus straddling the epoch — off-hour
  offsets on both sides of 1970-01-01 (so floor(epoch/3600) !=
  trunc(epoch/3600) on the negative rows), one row exactly at epoch 0;
* orders with three pre-1970 o_orderdate rows appended (for the
  date_trunc twin).

Each parametrized case runs the REGISTERED queries() entry and its
oracle_sql() side-by-side on that directory through the same
rowcount/schema/bitwise-value compare the local oracle gate uses —
i.e. the production twin pair, not a re-statement of it.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import __spark_entry__ as entry_mod
from check_oracle import compare, duck_con  # noqa: E402

SRC = "/root/testdata/sf0.001"

US = 1_000_000
HOUR_US = 3_600 * US

# every time-bucketing / time-ordered twin in the registry (events- or
# orders-based); streaming twins included — their foreachBatch folds
# bucket by the same epoch math
TIME_TWINS = [
    "gapfill_hourly_locf",
    "gapfill_hourly_interp",
    "session_concurrency_hourly",
    "lttb_m4_hourly",
    "ohlc_hourly_value",
    "sliding_distinct_users",
    "zorder_events",
    "hopping_window_counts",
    "date_trunc_family",
    "sessionize_events",
    "mv_incremental_daily",
    "ewma_user_value",
    "streaming_lttb_value",
    "streaming_ohlc_value",
]


def _synth_events() -> pa.Table:
    """~200 rows across 1969-12-30 .. 1970-01-02, 4 users. Offsets are
    deliberately NOT hour-aligned: -k*7000s - 123s puts every pre-epoch
    row strictly inside an hour so floor and trunc bucket differently."""
    rows = []
    eid = 0
    for k in range(96):  # pre-epoch, newest first: -123s, -7123s, ...
        ts = -(k * 7_000 + 123) * US
        rows.append((eid, ts, eid % 4, ["view", "click", "signup", "purchase", "error"][eid % 5], round(5.0 + (eid * 7) % 40 + 0.25, 2), json.dumps({"k": eid % 100})))
        eid += 1
    rows.append((eid, 0, 0, "view", 9.5, json.dumps({"k": 0})))  # epoch 0
    eid += 1
    for k in range(96):  # post-epoch mirror
        ts = (k * 7_000 + 123) * US
        rows.append((eid, ts, eid % 4, ["view", "click", "signup", "purchase", "error"][eid % 5], round(5.0 + (eid * 7) % 40 + 0.25, 2), json.dumps({"k": eid % 100})))
        eid += 1
    rows.sort(key=lambda r: r[1])
    ids = list(range(len(rows)))  # event_id re-assigned in ts order
    return pa.table(
        {
            "event_id": pa.array(ids, type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], type=pa.float64()),
            "props": pa.array([r[5] for r in rows]),
        }
    )


@pytest.fixture(scope="session")
def neg_epoch_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("neg_epoch_sf"))
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SRC, f), os.path.join(out, f))
    pq.write_table(_synth_events(), os.path.join(out, "events.parquet"))
    orders = pq.read_table(os.path.join(SRC, "orders.parquet"))
    okey0 = int(pa.compute.max(orders["o_orderkey"]).as_py()) + 1
    extra = pa.table(
        {
            "o_orderkey": pa.array([okey0, okey0 + 1, okey0 + 2], type=pa.int64()),
            "o_custkey": pa.array([1, 2, 3], type=pa.int64()),
            "o_orderstatus": pa.array(["F", "F", "O"]),
            "o_totalprice": pa.array([1234.56, 999.99, 50_000.0]),
            "o_orderdate": pa.array(
                [-86_400 * 245 * US - 3_600 * US, -86_400 * US, -1 * US],
                type=pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(["1-URGENT", "5-LOW", "3-MEDIUM"]),
        }
    )
    pq.write_table(
        pa.concat_tables([orders, extra]), os.path.join(out, "orders.parquet")
    )
    return out


@pytest.mark.parametrize("name", TIME_TWINS)
def test_time_bucketing_twin_on_negative_epochs(spark, neg_epoch_dir, name):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert name in qs, f"{name} missing from queries()"
    assert name in oracles, f"{name} has no oracle — time twins must have one"
    got = qs[name](spark, neg_epoch_dir).toPandas()
    con = duck_con(neg_epoch_dir)
    try:
        exp = con.sql(oracles[name]).df()
    finally:
        con.close()
    # the doctored corpus must actually exercise the hazard: at least
    # one pre-epoch row reaches every events-based query's input
    problems = compare(name, got, exp)
    assert not problems, f"{name}: {problems}"
    if name not in ("date_trunc_family",):
        assert len(got) > 0, f"{name}: twin produced no rows on the corpus"
