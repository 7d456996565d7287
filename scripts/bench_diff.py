"""Perf-regression guard: diff a fresh stage profile against the committed
baseline (VERDICT r1 item 10).

Usage:
  python scripts/profile_stages.py --json /tmp/stages.json   # on TPU
  python scripts/bench_diff.py /tmp/stages.json              # vs PERF_BASELINE.json
  python scripts/bench_diff.py /tmp/stages.json --update     # accept as new baseline

Exit code 1 if any stage regressed by more than --tol (default 15%), so the
script can gate a round's perf changes. The baseline file records the
per-stage ms table of `scripts/profile_stages.py` on the real chip; keep it
updated whenever a deliberate perf change lands (BASELINE.md holds the
narrative numbers, this file holds the machine-readable ones)."""

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(ROOT, "PERF_BASELINE.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("current", help="stage JSON from profile_stages --json")
    ap.add_argument("--baseline", default=BASELINE)
    ap.add_argument("--tol", type=float, default=0.15,
                    help="fractional slowdown that counts as a regression")
    ap.add_argument("--update", action="store_true",
                    help="overwrite the baseline with the current profile")
    args = ap.parse_args()

    with open(args.current) as f:
        cur = json.load(f)
    if args.update or not os.path.exists(args.baseline):
        with open(args.baseline, "w") as f:
            json.dump(cur, f, indent=1)
        print(f"baseline {'updated' if args.update else 'created'}: "
              f"{args.baseline}")
        return 0

    with open(args.baseline) as f:
        base = json.load(f)
    if cur.get("backend") != base.get("backend"):
        print(f"WARNING: backend mismatch (baseline {base.get('backend')}, "
              f"current {cur.get('backend')}) — deltas not comparable")

    regressions = []
    print(f"{'stage':>28} {'base ms':>9} {'cur ms':>9} {'delta':>8}")
    for name, b in base["stages_ms"].items():
        c = cur["stages_ms"].get(name)
        if c is None:
            print(f"{name:>28} {b:9.3f} {'-':>9} {'GONE':>8}")
            continue
        d = (c - b) / b
        flag = " <-- REGRESSED" if d > args.tol else ""
        print(f"{name:>28} {b:9.3f} {c:9.3f} {d:+7.1%}{flag}")
        if d > args.tol:
            regressions.append((name, b, c))
    for name in sorted(set(cur["stages_ms"]) - set(base["stages_ms"])):
        print(f"{name:>28} {'-':>9} {cur['stages_ms'][name]:9.3f} "
              f"{'NEW':>8}")

    if regressions:
        print(f"\n{len(regressions)} stage(s) regressed beyond "
              f"{args.tol:.0%}")
        return 1
    print("\nno regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
