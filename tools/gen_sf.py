"""Generate a FRESH synthetic SF directory (default sf1 = 10x sf0.1)
matching the driver testdata's schemas and *measured distributions* —
for performance probing of the FULL bench suite beyond the largest
driver-provided SF.

Unlike `scale_probe.build_big_sf` (id-shifted REPLICAS of sf0.1, where
every doc gains factor-1 true near-duplicates by construction and
near-dup output grows quadratically in the factor), this generator
samples NEW rows i.i.d. from the distributions profiled on the driver's
sf0.1 data, and plants duplicates at the driver's measured RATES:

* documents: ~55-word bags over a HEAPS'-LAW vocabulary — V(factor) =
  round(30 * factor^beta), beta 0.5 by default (`--vocab-beta=0`
  recovers the old fixed-30-word corpus). At factor=1 the vocabulary
  is exactly the driver's 30 words and the output is byte-identical
  to the pre-Heaps generator. Rationale (r11 verdict #1): with a
  FIXED vocabulary the shingle space saturates as n grows — 773k->826k
  distinct shingles for 10x docs at sf10 — so collision volume
  (sum df^2, simhash accidental-near mass) grows super-linearly and
  the sf1/sf10 ladders measured corpus saturation, not plan scaling.
  Real corpora grow vocabulary ~n^0.5 (Heaps' law), keeping per-pair
  collision probability roughly flat; on this corpus a super-linear
  ladder point is attributable to the PLAN again.
  5% near-duplicates (a copy of an earlier doc + " dup" suffix — the
  driver's own planting scheme, visible in the data) and ~0.32% exact
  duplicates, both scattered over shuffled doc_ids. Near-dup OUTPUT
  therefore grows linearly with SF, like a real corpus at constant
  duplication rate.
* events: uniform 30-day Jan-2024 timestamps, uniform user over
  15k users (10x the sf0.1 1500), exponential(mean 50) value,
  uniform 5 event types, props = {"k": randint(0,100)}.
* TPC-H-ish tables: uniform/categorical parameters measured off sf0.1
  (lines-per-order sampled from the empirical histogram; retailprice
  follows the driver's exact 900 + (partkey % 1000)/10 pattern).
* embeddings: uniform unit vectors on S^63, uniform labels 0..9.
* nation/region: fixed dims, copied from the driver directory.

Determinism: numpy PCG64 seeded per-table; same output every run.

Usage:
  python tools/gen_sf.py [--factor=10] [--out=/tmp/henbun_scale/sf1_fresh]
                         [--tables=documents,embeddings] [--vocab-beta=0.5]

PERFORMANCE ONLY — correctness stays on the driver testdata + DuckDB.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.145, 0.15, 0.145, 0.15]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]
SEGMENTS = ["AUTOMOBILE", "FURNITURE", "MACHINERY", "BUILDING", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_ADJ = ["new", "cold", "red", "large", "hot", "blue", "old", "small"]
P_NOUN = ["widget", "ring", "gear", "gizmo", "anvil", "bolt", "plate", "rod"]
P_TYPES = ["ECONOMY", "LARGE", "STANDARD", "SMALL", "PROMO", "MEDIUM"]
# empirical lines-per-order histogram at sf0.1 (count -> orders)
LPO_COUNTS = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17]
LPO_WEIGHTS = [
    11016, 21814, 29500, 29097, 23631, 15625, 8941, 4407, 1959, 818,
    292, 93, 29, 10, 1, 2, 1,
]

US = 1_000_000
DAY_US = 86_400 * US
JAN1_2024_US = 1_704_067_200 * US  # 2024-01-01T00:00:00Z
D1995_US = 788_918_400 * US  # 1995-01-01
ODATE_DAYS = 2_404  # 1995-01-01 .. 2001-08-01
SHIPDATE_LO_US = D1995_US + DAY_US  # 1995-01-02
SHIP_DAYS = 2_498  # .. 2001-11-04


def _write(out_dir, name, table):
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path, row_group_size=200_000)
    print(f"  {name}: {table.num_rows} rows -> {path}")


def _ts_col(us_array):
    return pa.array(us_array, type=pa.timestamp("us"))


#: Heaps'-law exponent for the documents vocabulary; set by main()
#: from --vocab-beta (0 = legacy fixed-30-word corpus).
VOCAB_BETA = 0.5


def heaps_vocab(factor: int, beta: float) -> list[str]:
    """V(factor) = round(30 * factor^beta) words: the driver's 30 words
    first (factor=1 is byte-identical to the legacy generator), then
    deterministic synthetic tokens."""
    v = max(len(VOCAB), int(round(len(VOCAB) * float(factor) ** beta)))
    return VOCAB + [f"tok{i:04d}" for i in range(v - len(VOCAB))]


def gen_documents(out_dir, factor):
    rng = np.random.default_rng(4201)
    vocab = heaps_vocab(factor, VOCAB_BETA)
    n = 5_000 * factor
    n_near = int(round(0.05 * n))
    n_exact = int(round(0.0032 * n))
    n_base = n - n_near - n_exact
    lens = rng.integers(10, 101, size=n_base)
    words = rng.integers(0, len(vocab), size=int(lens.sum()))
    texts, pos = [], 0
    for ln in lens:
        texts.append(" ".join(vocab[w] for w in words[pos : pos + ln]))
        pos += ln
    # near-dups: a copy of a random base doc + " dup"
    for src in rng.integers(0, n_base, size=n_near):
        texts.append(texts[src] + " dup")
    # exact dups: verbatim copies
    for src in rng.integers(0, n_base, size=n_exact):
        texts.append(texts[src])
    order = rng.permutation(n)
    texts = [texts[i] for i in order]
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    sources = np.char.add("src", rng.integers(0, 20, size=n).astype(str))
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs.tolist()),
            "source": pa.array(sources.tolist()),
            "n_chars": pa.array(
                np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
            ),
        }
    )
    _write(out_dir, "documents", tbl)


def gen_embeddings(out_dir, factor):
    rng = np.random.default_rng(4202)
    n = 2_000 * factor
    m = rng.standard_normal((n, 64)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.reshape(-1)), 64
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=n).astype(np.int32)),
        }
    )
    _write(out_dir, "embeddings", tbl)


def gen_events(out_dir, factor):
    rng = np.random.default_rng(4203)
    n = 100_000 * factor
    n_users = 1_500 * factor
    ts = JAN1_2024_US + rng.integers(0, 30 * DAY_US, size=n)
    props = np.char.add(
        np.char.add('{"k": ', rng.integers(0, 100, size=n).astype(str)), "}"
    )
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": _ts_col(np.sort(ts)),
            "user_id": pa.array(rng.integers(0, n_users, size=n)),
            "event_type": pa.array(rng.choice(EVENT_TYPES, size=n).tolist()),
            "value": pa.array(np.round(rng.exponential(50.0, size=n), 2)),
            "props": pa.array(props.tolist()),
        }
    )
    _write(out_dir, "events", tbl)


def gen_customer(out_dir, factor):
    rng = np.random.default_rng(4204)
    n = 15_000 * factor
    keys = np.arange(n, dtype=np.int64)
    tbl = pa.table(
        {
            "c_custkey": pa.array(keys),
            "c_name": pa.array([f"Customer#{k:09d}" for k in keys]),
            "c_nationkey": pa.array(
                rng.integers(0, 25, size=n).astype(np.int32)
            ),
            "c_acctbal": pa.array(
                np.round(rng.uniform(-1_000, 10_000, size=n), 2)
            ),
            "c_mktsegment": pa.array(rng.choice(SEGMENTS, size=n).tolist()),
        }
    )
    _write(out_dir, "customer", tbl)


def gen_supplier(out_dir, factor):
    rng = np.random.default_rng(4205)
    n = 1_000 * factor
    keys = np.arange(n, dtype=np.int64)
    tbl = pa.table(
        {
            "s_suppkey": pa.array(keys),
            "s_name": pa.array([f"Supplier#{k:09d}" for k in keys]),
            "s_nationkey": pa.array(
                rng.integers(0, 25, size=n).astype(np.int32)
            ),
            "s_acctbal": pa.array(np.round(rng.uniform(0, 10_000, size=n), 2)),
        }
    )
    _write(out_dir, "supplier", tbl)


def gen_part(out_dir, factor):
    rng = np.random.default_rng(4206)
    n = 20_000 * factor
    keys = np.arange(n, dtype=np.int64)
    names = np.char.add(
        np.char.add(rng.choice(P_ADJ, size=n), " "), rng.choice(P_NOUN, size=n)
    )
    tbl = pa.table(
        {
            "p_partkey": pa.array(keys),
            "p_name": pa.array(names.tolist()),
            "p_brand": pa.array(
                np.char.add(
                    "Brand#", rng.integers(1, 26, size=n).astype(str)
                ).tolist()
            ),
            "p_type": pa.array(rng.choice(P_TYPES, size=n).tolist()),
            "p_size": pa.array(rng.integers(1, 51, size=n).astype(np.int32)),
            "p_retailprice": pa.array(
                np.round(900.0 + (keys % 1000) / 10.0, 1)
            ),
        }
    )
    _write(out_dir, "part", tbl)


def gen_orders_lineitem(out_dir, factor):
    rng = np.random.default_rng(4207)
    n_ord = 150_000 * factor
    n_cust = 15_000 * factor
    okeys = np.arange(n_ord, dtype=np.int64)
    odate_us = D1995_US + rng.integers(0, ODATE_DAYS, size=n_ord) * DAY_US
    orders = pa.table(
        {
            "o_orderkey": pa.array(okeys),
            "o_custkey": pa.array(rng.integers(0, n_cust, size=n_ord)),
            "o_orderstatus": pa.array(
                rng.choice(["O", "P", "F"], size=n_ord).tolist()
            ),
            "o_totalprice": pa.array(
                np.round(rng.uniform(1_000, 500_000, size=n_ord), 2)
            ),
            "o_orderdate": _ts_col(odate_us),
            "o_orderpriority": pa.array(
                rng.choice(PRIORITIES, size=n_ord).tolist()
            ),
        }
    )
    _write(out_dir, "orders", orders)

    lpo = rng.choice(
        np.array(LPO_COUNTS),
        size=n_ord,
        p=np.array(LPO_WEIGHTS) / sum(LPO_WEIGHTS),
    )
    n_li = int(lpo.sum())
    l_orderkey = np.repeat(okeys, lpo)
    # linenumber cycles 1..7 within an order (driver max is 7)
    ln = np.concatenate([np.arange(c) % 7 + 1 for c in lpo]).astype(np.int32)
    tbl = pa.table(
        {
            "l_orderkey": pa.array(l_orderkey),
            "l_partkey": pa.array(
                rng.integers(0, 20_000 * factor, size=n_li)
            ),
            "l_suppkey": pa.array(rng.integers(0, 1_000 * factor, size=n_li)),
            "l_linenumber": pa.array(ln),
            "l_quantity": pa.array(
                rng.integers(1, 51, size=n_li).astype(np.float64)
            ),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(900, 105_000, size=n_li), 2)
            ),
            "l_discount": pa.array(
                np.round(rng.integers(0, 11, size=n_li) / 100.0, 2)
            ),
            "l_tax": pa.array(
                np.round(rng.integers(0, 9, size=n_li) / 100.0, 2)
            ),
            "l_returnflag": pa.array(
                rng.choice(["A", "N", "R"], size=n_li).tolist()
            ),
            "l_linestatus": pa.array(
                rng.choice(["F", "O"], size=n_li).tolist()
            ),
            "l_shipdate": _ts_col(
                SHIPDATE_LO_US + rng.integers(0, SHIP_DAYS, size=n_li) * DAY_US
            ),
        }
    )
    _write(out_dir, "lineitem", tbl)


def main():
    factor = 10
    out_dir = None
    tables = None  # None = all
    for a in sys.argv[1:]:
        if a.startswith("--factor="):
            factor = int(a.split("=", 1)[1])
        elif a.startswith("--out="):
            out_dir = a.split("=", 1)[1]
        elif a.startswith("--tables="):
            # subset generation (e.g. --tables=documents,embeddings) for
            # sfN probes of queries that only read the corpus tables —
            # sf10 lineitem is 60M rows nothing in the probe would scan
            tables = {t.strip() for t in a.split("=", 1)[1].split(",") if t.strip()}
        elif a.startswith("--vocab-beta="):
            global VOCAB_BETA
            VOCAB_BETA = float(a.split("=", 1)[1])
    if out_dir is None:
        out_dir = f"/tmp/henbun_scale/sf{0.1 * factor:g}_fresh"
    os.makedirs(out_dir, exist_ok=True)
    print(f"generating fresh sf{0.1 * factor:g} at {out_dir}")
    gens = {
        "documents": gen_documents,
        "embeddings": gen_embeddings,
        "events": gen_events,
        "customer": gen_customer,
        "supplier": gen_supplier,
        "part": gen_part,
        "orders": gen_orders_lineitem,  # writes orders + lineitem
    }
    if tables is not None:
        unknown = tables - set(gens) - {"lineitem", "nation", "region"}
        if unknown:
            raise SystemExit(f"unknown --tables entries: {sorted(unknown)}")
    for dim in ("nation", "region"):
        if tables is None or dim in tables:
            shutil.copy(
                os.path.join(SRC, f"{dim}.parquet"),
                os.path.join(out_dir, f"{dim}.parquet"),
            )
    for name, fn in gens.items():
        if tables is None or name in tables or (
            name == "orders" and "lineitem" in tables
        ):
            fn(out_dir, factor)
    manifest = {
        "factor": factor,
        "source_profile": SRC,
        "seeded": True,
        "tables": sorted(tables) if tables is not None else "all",
        "vocab_beta": VOCAB_BETA,
        "vocab_size": len(heaps_vocab(factor, VOCAB_BETA)),
    }
    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f)
    print("done")


if __name__ == "__main__":
    main()
