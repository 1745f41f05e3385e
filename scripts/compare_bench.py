"""Diff two bench artifacts per-query (round-start vs seal, etc.).

Usage: python scripts/compare_bench.py BEFORE.json AFTER.json [--top N]

Prints total/normalized deltas and the top movers by absolute seconds.
Host-variance caveat applies: cross-session deltas are drift-contaminated;
treat this as a reporting aid, not an A/B (see scripts/ab_entry.py).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("before")
    ap.add_argument("after")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()
    b = json.load(open(args.before))
    a = json.load(open(args.after))
    qb, qa = b["queries"], a["queries"]
    common = [k for k in qb if k in qa]
    print(
        f"before: total {b['value']} (drift {b.get('drift_ratio')})  "
        f"after: total {a['value']} (drift {a.get('drift_ratio')})  "
        f"common entries: {len(common)}"
    )
    tb = sum(qb[k] for k in common)
    ta = sum(qa[k] for k in common)
    print(f"common-entry sums: {tb:.2f} -> {ta:.2f}  ({tb / ta:.2f}x)")
    movers = sorted(common, key=lambda k: qa[k] - qb[k])
    print(f"\n{'entry':42s} {'before':>8s} {'after':>8s} {'delta':>8s}")
    shown = [m for m in movers if abs(qa[m] - qb[m]) >= 0.15]
    for k in (shown[: args.top] + shown[-args.top :]):
        print(f"{k:42s} {qb[k]:8.2f} {qa[k]:8.2f} {qa[k] - qb[k]:+8.2f}")


if __name__ == "__main__":
    main()
