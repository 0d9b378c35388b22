"""Compare two bench JSON files (e.g. BENCH_r03.json vs a fresh run) and
print per-query deltas beyond a noise ratio — the non-regression view the
BASELINE contract tracks. Host timing noise on this VM is ±3x for
sub-second queries, so only sustained multi-x regressions on queries
above a floor are flagged.

Usage: python tools/bench_diff.py OLD.json NEW.json [ratio=2.0] [floor_s=1.0]
"""

from __future__ import annotations

import json
import sys

# gauge->drag calibration fit — MIRRORS bench.py (the source of truth;
# bench.py imports the whole engine so we inline the three constants
# here to keep this tool import-light; tests/test_bench_gauge.py pins
# the two copies equal).
GAUGE_FIT_SLOPE = 1.40
GAUGE_FIT_INTERCEPT = -0.60
IDLE_GAUGE = 1.232


def est_drag(gauge):
    if gauge is None:
        return None
    raw = GAUGE_FIT_SLOPE * gauge + GAUGE_FIT_INTERCEPT
    idle = GAUGE_FIT_SLOPE * IDLE_GAUGE + GAUGE_FIT_INTERCEPT
    return max(1.0, raw / idle)


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read().strip()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = None
    if d is None:
        # plain bench stdout: last line holding the metric JSON
        for line in reversed(text.splitlines()):
            line = line.strip()
            if line.startswith('{"metric"'):
                d = json.loads(line)
                break
    if d is not None and "queries" not in d and isinstance(d.get("tail"), str):
        # driver wrapper: the metric line is embedded in the log tail
        tail = d["tail"].replace("\r", "\n")
        for line in reversed(tail.splitlines()):
            line = line.strip()
            if line.startswith('{"metric"'):
                return json.loads(line)
    if d is None or "queries" not in d:
        raise SystemExit(f"no bench metric JSON found in {path}")
    return d


def main() -> int:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    print(f"total: {old.get('value')}s -> {new.get('value')}s "
          f"({len(oq)} -> {len(nq)} queries, {len(shared)} shared)")

    def gauge(d):
        return (d.get("throttle") or {}).get("regime_gauge")

    def regime(d):
        t = d.get("throttle") or {}
        g = t.get("regime_gauge")
        return f"{t.get('regime', '?')} (gauge {g})" if g else "unknown"

    # a loud-regime run's raw numbers overstate regressions — when both
    # runs carry a regime gauge, normalize the comparison by the
    # calibrated gauge->drag estimate (bench.est_drag) so a plan delta
    # is separated from uniform host drag; cross-run minima remain the
    # ground truth for absolute numbers (docs/BENCH_NOTES.md).
    print(f"regimes: {regime(old)} -> {regime(new)}")
    da, db = est_drag(gauge(old)), est_drag(gauge(new))
    adj = (db / da) if (da and db) else 1.0
    if adj != 1.0:
        sa = sum(v for v in oq.values() if v > 0)
        sb = sum(v for v in nq.values() if v > 0)
        print(
            f"drag-adjusted: est {da:.3f}x -> {db:.3f}x; NEW totals "
            f"divided by {adj:.3f} for comparison "
            f"(adjusted sum {sb / db:.1f}s vs old {sa / da:.1f}s)"
        )
    flagged = 0
    for name in shared:
        a, b = oq[name], nq[name]
        if a <= 0 or b <= 0:
            if a <= 0 < b:
                print(f"  FIXED   {name}: failed -> {b}s")
            elif b <= 0 < a:
                print(f"  BROKE   {name}: {a}s -> failed")
                flagged += 1
            continue
        b_adj = b / adj
        if b_adj > max(a * ratio, floor):
            print(
                f"  SLOWER  {name}: {a}s -> {b}s "
                f"({b / a:.1f}x raw, {b_adj / a:.1f}x drag-adjusted)"
            )
            flagged += 1
        elif a > max(b_adj * ratio, floor):
            print(f"  faster  {name}: {a}s -> {b}s")
    added = sorted(set(nq) - set(oq))
    if added:
        print(f"  new queries: {len(added)}")
    print("REGRESSIONS" if flagged else "NO REGRESSIONS")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
