"""Measure the host's CURRENT throttling regime in ~15 seconds, without
running the suite: spin up a minimal local session, run the same trivial
probe `bench.py`'s sentinel uses N times, and report the spread against
the calibrated quiet-regime floor recorded in the committed archives.

Use before launching a full bench run: a median far above the committed
floors means the numbers will land in the loud regime (compare via
cross-run minima; see docs/BENCH_NOTES.md).

Usage: python tools/host_gauge.py [n_probes=20]
Exit code: 0 quiet-ish, 1 loud (median > 2x the best committed floor).

CAVEAT on the threshold: the committed floors are ROLLING MINIMA over
170+ in-suite probes (they catch the quietest instant of a 25-minute
run), so a 20-probe standalone median sits above them even on a calm
host — the ratio here is an UPPER BOUND on the suite gauge. 2x is a
rough advisory cut until a genuinely quiet window calibrates this
estimator; trust the in-suite `regime_gauge` over this tool.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    floors = []
    for path in glob.glob(
        os.path.join(os.path.dirname(__file__), "..", "bench_history", "BENCH_*.json")
    ):
        try:
            with open(path) as f:
                t = json.load(f).get("throttle") or {}
            if t.get("probe_floor"):
                floors.append(float(t["probe_floor"]))
        except (OSError, json.JSONDecodeError):
            continue
    committed_floor = min(floors) if floors else None

    from henbun_spark import sources

    # SAME session shape as bench.py — the committed floors were measured
    # on the bench's local[$SPARK_GRAFT_CPUS] sessions, and probe times
    # are not comparable across executor-thread counts
    spark = sources.get_spark("host-gauge")
    import bench

    # warm the JVM so the first probe isn't a JIT measurement
    for _ in range(3):
        bench.probe_once(spark)
    samples = sorted(bench.probe_once(spark) for _ in range(n))
    med = samples[len(samples) // 2]
    lo, hi = samples[0], samples[-1]
    ref = committed_floor if committed_floor else lo
    gauge = med / ref
    # 2x, not bench.REGIME_FACTOR — see the docstring caveat (this
    # estimator's median sits above the all-run minimum floor even when
    # the host is calm)
    regime = "loud" if gauge > 2.0 else "quiet"
    print(
        json.dumps(
            {
                "probe_min": round(lo, 4),
                "probe_median": round(med, 4),
                "probe_max": round(hi, 4),
                "committed_floor": None if committed_floor is None else round(committed_floor, 4),
                "gauge_vs_committed_floor": round(gauge, 3),
                "regime": regime,
            }
        )
    )
    return 0 if regime == "quiet" else 1


if __name__ == "__main__":
    sys.exit(main())
