"""Extras-regression compare between two BENCH_DETAIL artifacts — the
scripted check every round ran ad-hoc before committing a new official
bench (flag an extra as regressed only when BOTH the ratio and the
absolute delta move: >1.5x AND >+0.5 s, the threshold rounds 11-12
adjudicated against host drift).

Usage: python scripts/compare_bench.py OLD.json NEW.json
Exit 1 if any regression is flagged.
"""

from __future__ import annotations

import json
import sys

RATIO = 1.5
ABS_S = 0.5


def main() -> int:
    if len(sys.argv) != 3:
        # exit 2, not 1 — callers key on 1 meaning "regression flagged"
        print("usage: python scripts/compare_bench.py OLD.json NEW.json")
        return 2
    old_p, new_p = sys.argv[1], sys.argv[2]
    old = json.load(open(old_p))
    new = json.load(open(new_p))
    eo, en = old.get("extra_queries") or {}, new.get("extra_queries") or {}
    common = sorted(set(eo) & set(en))
    gone, added = sorted(set(eo) - set(en)), sorted(set(en) - set(eo))
    flagged = []
    for name in common:
        a, b = float(eo[name]), float(en[name])
        if b > a * RATIO and b - a > ABS_S:
            flagged.append((name, a, b))
    print(
        f"extras: {len(common)} common (sum {sum(float(eo[n]) for n in common):.1f}"
        f" -> {sum(float(en[n]) for n in common):.1f} s),"
        f" {len(added)} added {added}, {len(gone)} removed {gone}"
    )
    hq_old = old.get("queries", {})
    hq_new = new.get("queries", {})
    if hq_old and hq_new:
        print(
            f"headline: {sum(map(float, hq_old.values())):.3f}"
            f" -> {sum(map(float, hq_new.values())):.3f} s"
        )
    frames = new.get("stderr_stack_frames")
    print(f"stderr_stack_frames: {frames}")
    if flagged:
        print(f"REGRESSIONS (> {RATIO}x and > +{ABS_S} s):")
        for name, a, b in flagged:
            print(f"  {name}: {a:.3f} -> {b:.3f} s")
        return 1
    print("no extras regressions")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
