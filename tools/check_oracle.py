"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry at sf0.01 next to its ``oracle_sql()`` via
DuckDB, aligns columns by sorted name, sorts rows, and reports row-count /
schema / value equality (exact for ints & strings, bitwise for doubles —
stricter than any plausible driver hash).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from henbun_spark import sources
from henbun_spark.operators import relational


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in sources.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
            drop=True
        )
    return pdf


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    problems = []
    if len(got) != len(exp):
        return [f"rowcount {len(got)} != {len(exp)}"]
    if sorted(got.columns) != sorted(exp.columns):
        return [f"columns {sorted(got.columns)} != {sorted(exp.columns)}"]
    got, exp = normalize(got), normalize(exp)
    for c in got.columns:
        g, e = got[c], exp[c]
        # dtype-kind parity: the driver's value-hash is type-sensitive, so an
        # int column on one side vs float/int128 on the other fails there even
        # when values match numerically (how the sessionize HUGEINT bug
        # escaped round 1). Flag it here too.
        gk, ek = g.dtype.kind, e.dtype.kind
        if (gk in "iu") != (ek in "iu") and {gk, ek} <= set("iuf"):
            problems.append(f"col {c}: dtype kind {g.dtype} vs {e.dtype}")
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            ga = g.to_numpy(dtype=np.float64)
            ea = e.to_numpy(dtype=np.float64)
            both_nan = np.isnan(ga) & np.isnan(ea)
            eq = (ga == ea) | both_nan
            if not eq.all():
                diffs = np.abs(ga - ea)[~eq]
                problems.append(
                    f"col {c}: {(~eq).sum()}/{len(eq)} mismatch, "
                    f"maxdiff {np.nanmax(diffs):.3e}"
                )
        else:
            if not g.astype(str).equals(e.astype(str)):
                n = (g.astype(str) != e.astype(str)).sum()
                problems.append(f"col {c}: {n}/{len(g)} value mismatch")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = sources.get_spark("oracle-check")
    con = duck_con(sf_dir)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
            # safe: the query's derived frames were just materialized
            relational.release_scaffold_caches()
        except Exception:
            print(f"FAIL {name}: spark query raised")
            traceback.print_exc(limit=6)
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: oracle SQL raised")
            traceback.print_exc(limit=3)
            failed.append(name)
            continue
        problems = compare(name, got, exp)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"ok   {name}: {len(got)} rows exact ({time.time()-t0:.1f}s)")
    print(f"\n{len(failed)} failed: {failed}" if failed else "\nALL MATCH")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
