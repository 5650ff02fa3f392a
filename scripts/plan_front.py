"""Derive the driver-sampling window (ROUND{N}_FRONT) from the
CORRECTNESS_r01..rN union instead of hand-maintained displacement
bookkeeping (the round-12 verdict's ask: ~170 lines of rotation
comments in registry.py is how a wrong recycle order silently ages
certifications).

Rules, exactly the prose the hand-written plans followed:

1. NEW ops (registered but never driver-sampled — no row in any
   CORRECTNESS artifact) are GUARANTEED a slot: they are this round's
   additions and must get their first certification. Oracle-bearing
   additions lead rows-only ones; stable (module/declaration) registry
   order within each class.
2. The remaining slots recycle already-certified ops OLDEST
   CERTIFICATION FIRST (the freshness treadmill). Ties within one
   certification round break oracle-bearing-first, then stable
   registry order — so when a round's cohort straddles the window
   boundary, hash-certifiable ops renew before rows-only ones.
3. Recycled ops lead additions in the emitted tuple (the layout every
   round since r8 used); order inside the window is cosmetic — the
   driver samples all 50 — but keeping it deterministic makes the
   tuple reviewable and lets tests assert exact equality.

Usage:
  python scripts/plan_front.py            # print the next front tuple
  python scripts/plan_front.py --check    # exit 1 if CURRENT_FRONT
                                          # differs from the derived plan
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50  # the driver samples exactly the first 50 registry entries


def latest_certs(repo: str = REPO, exclude_max_round: bool = False) -> dict[str, int]:
    """op id -> latest round with a driver correctness row.

    ``exclude_max_round`` drops the NEWEST artifact: a front is derived
    BEFORE its round's correctness file exists, so once the driver
    writes CORRECTNESS_r{N}.json mid/end-round, re-deriving from the
    full union describes round N+1's window, not the current one — the
    pinning test accepts either reading (see test_etl_invariants)."""
    by_round: dict[int, list[str]] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        by_round[rnd] = list(json.load(open(f)))
    if exclude_max_round and by_round:
        by_round.pop(max(by_round))
    latest: dict[str, int] = {}
    for rnd, ops in by_round.items():
        for op_id in ops:
            latest[op_id] = max(rnd, latest.get(op_id, 0))
    return latest


def generate_front(ops, latest: dict[str, int], window: int = WINDOW) -> list[str]:
    """``ops``: the RAW merged registry (stable order, no front
    rotation — registry.merged_registry()); ``latest``: latest_certs()."""
    pos = {op_id: i for i, op_id in enumerate(ops)}
    additions = [o for o in ops if o not in latest]
    additions.sort(key=lambda o: (ops[o].oracle is None, pos[o]))
    if len(additions) > window:
        raise ValueError(
            f"{len(additions)} never-sampled ops exceed the {window}-slot"
            " window — some additions would miss certification this round"
        )
    recycled = sorted(
        (o for o in ops if o in latest),
        key=lambda o: (latest[o], ops[o].oracle is None, pos[o]),
    )[: window - len(additions)]
    return recycled + additions


def main() -> int:
    from claim_analysis_engine_spark.registry import CURRENT_FRONT, merged_registry

    ops = merged_registry()
    latest = latest_certs()
    unknown = sorted(set(latest) - set(ops))
    if unknown:
        print(f"WARNING: driver rows for unregistered ids: {unknown}")
    never = [o for o in ops if o not in latest]
    plan = generate_front(ops, latest)
    oldest = min((latest[o] for o in ops if o in latest), default=None)
    print(
        f"# derived front: {len(plan)} slots = "
        f"{len(plan) - len(never)} recycled (oldest cert r{oldest}) "
        f"+ {len(never)} additions {never}"
    )
    if "--check" in sys.argv:
        # accept either reading, exactly like the pinning test: the
        # shipped front was derived before its own round's artifact
        # existed, so once CORRECTNESS_r{N}.json lands the full-union
        # plan describes round N+1
        shipped = generate_front(ops, latest_certs(exclude_max_round=True))
        if list(CURRENT_FRONT) in (plan, shipped):
            print("CURRENT_FRONT matches the derived plan")
            return 0
        extra = [o for o in CURRENT_FRONT if o not in plan]
        missing = [o for o in plan if o not in CURRENT_FRONT]
        print(f"MISMATCH: in front but not plan: {extra}")
        print(f"          in plan but not front: {missing}")
        return 1
    for op_id in plan:
        print(f'    "{op_id}",')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
