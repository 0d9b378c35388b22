"""Growth analysis between an sf1 probe archive and an sf0.1 archive:
per-query time ratio for 10x rows, flagging super-linear queries
(ratio >= 2x the 10x data growth, i.e. time ratio >= 20).

Usage: python tools/sf1_analysis.py <BENCH_sf1.json> <BENCH_sf0.1.json>
Prints a markdown table sorted by ratio, with the flagged tail first.
Queries faster than 1s at sf0.1 are reported but not flagged (fixed
job overhead dominates them; a 0.3s -> 7s move is 23x on paper and
still nothing at all in absolute terms — absolute sf1 time is shown so
real offenders stand out).
"""

from __future__ import annotations

import json
import sys


def main():
    sf1 = json.load(open(sys.argv[1]))["queries"]
    sf01 = json.load(open(sys.argv[2]))["queries"]
    shared = sorted(set(sf1) & set(sf01))
    rows = []
    for q in shared:
        a, b = sf01[q], sf1[q]
        if a <= 0 or b <= 0:
            continue
        ratio = b / a
        flagged = ratio >= 20.0 and a >= 1.0 and b >= 10.0
        rows.append((flagged, ratio, q, a, b))
    rows.sort(key=lambda r: (-r[0], -r[1]))
    print(f"# sf0.1 -> sf1 growth ({len(rows)} shared queries, 10x rows)")
    print("| query | sf0.1 s | sf1 s | ratio | flag |")
    print("|---|---|---|---|---|")
    for flagged, ratio, q, a, b in rows[:40]:
        f = "SUPER-LINEAR" if flagged else ""
        print(f"| {q} | {a:.2f} | {b:.2f} | {ratio:.1f}x | {f} |")
    n_flag = sum(1 for r in rows if r[0])
    lin = [r[1] for r in rows if r[3] >= 1.0]
    if lin:
        lin.sort()
        print(
            f"\nflagged: {n_flag}; median ratio over >=1s queries: "
            f"{lin[len(lin) // 2]:.1f}x (linear = ~10x, sub-linear < 10x)"
        )
    return 1 if n_flag else 0


if __name__ == "__main__":
    sys.exit(main())
