"""Same-window A/B of a single session conf flag over a query subset.

Each pass is a FRESH subprocess+session (no cross-arm cache/JIT bleed),
arms alternate within the window (on,off,off,on,...) so host drift hits
both equally, and the per-query number is min-over-passes — the same
methodology as ``bench.py --ab`` but toggling a conf at HEAD instead of
comparing git refs. Built for the r13 serve-trio adjudication
(``canChangeCachedPlanOutputPartitioning``); generic over any flag.

Usage:
  python scripts/flag_toggle_probe.py \
      --conf spark.sql.optimizer.canChangeCachedPlanOutputPartitioning \
      --on true --off false \
      --queries docvec_ann_lsh_serve,docvec_neardup_pairs \
      --reps 3 --out toggle_probe.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
conf_key, conf_val, names_csv, out_path = sys.argv[2:6]
from pywrangler_spark.queries import QUERIES
from pywrangler_spark.session import get_spark
from pywrangler_spark.sources import read_parquet

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark("flag-toggle", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus),
                  extra_conf={"spark.driver.memory": "48g",
                              conf_key: conf_val})
spark.sparkContext.setLogLevel("ERROR")
try:
    read_parquet(spark, os.path.join(sf_dir, "lineitem.parquet")).count()
except Exception:
    pass
timings = {}
for name in sorted(names_csv.split(",")):
    t0 = time.perf_counter()
    try:
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
    except Exception as exc:
        timings[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
        continue
    timings[name] = round(time.perf_counter() - t0, 3)
    spark.catalog.clearCache()
with open(out_path, "w") as fh:
    json.dump(timings, fh)
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", required=True)
    ap.add_argument("--on", dest="on_val", required=True)
    ap.add_argument("--off", dest="off_val", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    workdir = tempfile.mkdtemp(prefix="flag_toggle_")
    runner = os.path.join(workdir, "runner.py")
    with open(runner, "w") as fh:
        fh.write(_RUNNER)

    best: dict = {"on": {}, "off": {}}
    for p in range(args.reps):
        order = ["on", "off"] if p % 2 == 0 else ["off", "on"]
        for arm in order:
            val = args.on_val if arm == "on" else args.off_val
            out = os.path.join(workdir, f"pass_{arm}_{p}.json")
            subprocess.check_call(
                [sys.executable, runner, REPO, args.conf, val,
                 args.queries, out],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            with open(out) as fh:
                for name, sec in json.load(fh).items():
                    if isinstance(sec, dict):
                        best.setdefault("errors", {})[name] = sec
                        continue
                    cur = best[arm].get(name)
                    if cur is None or sec < cur:
                        best[arm][name] = sec
            print(f"pass {p} arm {arm}: done", file=sys.stderr)

    shared = sorted(set(best["on"]) & set(best["off"]))
    result = {
        "metric": "flag_on_over_off",
        "conf": args.conf,
        "on": args.on_val,
        "off": args.off_val,
        "sf_dir": os.environ.get("SPARK_GRAFT_SF_DIR",
                                 "/root/testdata/sf0.1"),
        "reps": args.reps,
        "best_on": best["on"],
        "best_off": best["off"],
        "ratios": {
            n: round(best["on"][n] / best["off"][n], 3) for n in shared
        },
    }
    if best.get("errors"):
        result["errors"] = best["errors"]
    with open(os.path.join(REPO, args.out), "w") as fh:
        json.dump(result, fh)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
