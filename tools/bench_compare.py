"""Compare two BENCH_DETAIL.json files key by key (r16 A/B evidence).

Usage: python tools/bench_compare.py BEFORE.json AFTER.json [threshold]
Prints keys sorted by absolute delta, flags regressions > threshold
(default 1.15x), and totals.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    before = json.load(open(sys.argv[1]))
    after = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.15
    qb, qa = before["queries"], after["queries"]
    common = sorted(set(qb) & set(qa), key=lambda k: qa[k] - qb[k])
    print(f"{'key':36s} {'before':>8s} {'after':>8s} {'ratio':>6s}")
    regress = []
    for k in common:
        r = qa[k] / qb[k] if qb[k] else float("inf")
        mark = ""
        if r > thr:
            mark = "  <-- REGRESSION"
            regress.append(k)
        print(f"{k:36s} {qb[k]:8.3f} {qa[k]:8.3f} {r:6.2f}{mark}")
    tb = sum(qb[k] for k in common)
    ta = sum(qa[k] for k in common)
    print(f"\ncommon-key total: {tb:.3f} -> {ta:.3f} ({ta / tb:.2f}x), "
          f"{len(regress)} regressions > {thr}x: {regress}")
    only_a = sorted(set(qa) - set(qb))
    if only_a:
        print(f"new keys: {only_a}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
