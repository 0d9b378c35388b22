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

    def regime(d):
        t = d.get("throttle") or {}
        g = t.get("regime_gauge")
        return f"{t.get('regime', '?')} (gauge {g})" if g else "unknown"

    # a loud-regime run's raw numbers overstate regressions — compare
    # cross-run minima instead (docs/BENCH_NOTES.md)
    print(f"regimes: {regime(old)} -> {regime(new)}")
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
        if b > max(a * ratio, floor):
            print(f"  SLOWER  {name}: {a}s -> {b}s ({b / a:.1f}x)")
            flagged += 1
        elif a > max(b * ratio, floor):
            print(f"  faster  {name}: {a}s -> {b}s")
    added = sorted(set(nq) - set(oq))
    if added:
        print(f"  new queries: {len(added)}")
    print("REGRESSIONS" if flagged else "NO REGRESSIONS")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
