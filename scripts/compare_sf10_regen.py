#!/usr/bin/env python
"""Vet a freshly regenerated sf10 isolated column against the previous
(possibly probe-patched) artifact before blessing it.

A full ``bench.py --isolated`` regen and a same-window probe pair measure
the same thing (min of warm in-subprocess reps), but hours apart — host
drift can move individual numbers. This prints every query whose fresh
value moved more than ``--tol`` (default 1.5x) in either direction so the
replacement is an adjudicated decision, not a silent swap.

Usage: python scripts/compare_sf10_regen.py OLD.json NEW.json [--tol 1.5]
"""
import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old", metavar="OLD.json")
    ap.add_argument("new", metavar="NEW.json")
    ap.add_argument("--tol", type=float, default=1.5)
    ns = ap.parse_args()
    tol = ns.tol
    old_p, new_p = ns.old, ns.new
    with open(old_p) as fh:
        old = json.load(fh)
    with open(new_p) as fh:
        new = json.load(fh)
    oq, nq = old["queries"], new["queries"]
    patched = set(old.get("patches", {}))
    shared = sorted(set(oq) & set(nq))
    missing = sorted(set(oq) - set(nq))
    added = sorted(set(nq) - set(oq))
    moved = []
    for name in shared:
        if oq[name] <= 0:
            continue
        r = nq[name] / oq[name]
        if r > tol or r < 1 / tol:
            moved.append((r, name))
    moved.sort(reverse=True)
    print(f"shared={len(shared)} missing_in_new={missing} added={added}")
    print(f"old_total={sum(oq[n] for n in shared):.1f}s "
          f"new_total={sum(nq[n] for n in shared):.1f}s")
    if new.get("errors"):
        print(f"NEW ERRORS: {new['errors']}")
    if not moved:
        print(f"no query moved beyond {tol}x — bless the regen")
    for r, name in moved:
        tag = " [was probe-patched]" if name in patched else ""
        print(f"  {r:5.2f}x  {name}: {oq[name]:.1f}s -> {nq[name]:.1f}s{tag}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
