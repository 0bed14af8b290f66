#!/usr/bin/env python
"""Probe: wall number for the adaptive routing's above-budget SPLIT
branch (operators/spandedup.py) on real scaled data.

The r11 verdict's one coverage hole: every measured run took the
whole-set-broadcast branch because real dup sets (~238k grams at
sf100) sit far under the 2M-row budget. This probe forces the split
on the same corpus by lowering ``HOT_BUDGET_ROWS`` so the derived
threshold ``ceil(sum(_nd)/budget)`` lands INSIDE the measured _nd
distribution (budget = ceil(sum / p99(_nd)) → hot ≈ the top-1%-mass
grams), then runs a paired same-window A/B:

  D — shipped adaptive default (whole-set broadcast at this scale)
  S — forced split: hot grams broadcast (bounded by budget), cold
      tail shuffled

identical outputs asserted; walls + total shuffle write recorded.

  python scripts/span_split_probe.py [sf_dir] [reps] [out]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
variant, sf_dir, out_path = sys.argv[2], sys.argv[3], sys.argv[4]

from pyspark.sql import functions as F
from pywrangler_spark.session import get_spark
from pywrangler_spark.sources import read_parquet
from pywrangler_spark.operators import spandedup
from pywrangler_spark.operators.spandedup import (
    _distinct_doc_grams, duplicate_span_stats,
)

N, MIN_DOCS = 5, 2
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark("span-split-probe", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus),
                  extra_conf={"spark.driver.memory": "48g",
                              "spark.ui.enabled": "true"})
spark.sparkContext.setLogLevel("ERROR")
import bench
read_stages = bench._stage_metrics_reader(spark)

docs = read_parquet(
    spark, os.path.join(sf_dir, "documents.parquet")
).select("doc_id", "text")

split_facts = {}
if variant == "S":
    # size the budget so the derived threshold lands inside the real
    # _nd distribution: thr ~= p99(_nd) -> hot = top-1%-mass grams
    dup = (
        _distinct_doc_grams(docs, "doc_id", "text", N)
        .groupBy("_gh")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") >= MIN_DOCS)
    )
    stats = dup.agg(
        F.count(F.lit(1)).alias("c"), F.sum("_nd").alias("s"),
        F.max("_nd").alias("mx"),
    ).first()
    p99 = dup.approxQuantile("_nd", [0.99], 0.001)[0]
    thr_target = max(MIN_DOCS + 1, int(p99))
    budget = max(1, -(-int(stats.s) // thr_target))
    if budget >= stats.c:
        budget = max(1, stats.c // 2)  # still force the split branch
    spandedup.HOT_BUDGET_ROWS = budget
    realized_thr = max(MIN_DOCS, -(-int(stats.s) // budget))
    n_hot = dup.filter(F.col("_nd") >= realized_thr).count()
    split_facts = {
        "dup_count": stats.c, "dup_mass": int(stats.s),
        "max_nd": int(stats.mx), "p99_nd": p99,
        "budget": budget, "threshold": realized_thr, "n_hot": n_hot,
    }

out = docs.transform(
    duplicate_span_stats("doc_id", "text", n=N, min_docs=MIN_DOCS)
)

t0 = time.perf_counter()
row = out.agg(
    F.count(F.lit(1)).alias("n"),
    F.sum("n_masked").alias("m"),
    F.sum(F.round(F.col("dup_ratio"), 6)).alias("r"),
).collect()[0]
elapsed = time.perf_counter() - t0
time.sleep(0.5)
snap = read_stages() if read_stages else {}
sh_w = round(sum(s.get("shuffleWriteBytes", 0)
                 for s in snap.values()) / 2**20, 1)
with open(out_path, "w") as fh:
    json.dump({"variant": variant, "wall_s": round(elapsed, 2),
               "n": row.n, "m": int(row.m), "r": round(float(row.r), 3),
               "total_shuffle_write_mb": sh_w,
               "split_facts": split_facts}, fh)
"""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    out_path = sys.argv[3] if len(sys.argv) > 3 else "span_split_probe.json"
    variants = ("D", "S")
    results = {v: [] for v in variants}
    shuffles = {v: None for v in variants}
    facts: dict = {}
    split_facts: dict = {}
    with tempfile.TemporaryDirectory() as td:
        runner = os.path.join(td, "runner.py")
        with open(runner, "w") as fh:
            fh.write(_RUNNER)
        for _ in range(reps):
            for variant in variants:
                out = os.path.join(td, "out.json")
                if os.path.exists(out):
                    os.unlink(out)
                proc = subprocess.run(
                    [sys.executable, runner, REPO, variant, sf_dir, out],
                    stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
                    text=True,
                )
                if not os.path.exists(out):
                    print(proc.stderr[-1500:], file=sys.stderr)
                    return 1
                with open(out) as fh:
                    r = json.load(fh)
                results[variant].append(r["wall_s"])
                shuffles[variant] = r["total_shuffle_write_mb"]
                if r.get("split_facts"):
                    split_facts = r["split_facts"]
                key = (r["n"], r["m"], r["r"])
                facts.setdefault(variant, key)
                print(f"{variant}: {r['wall_s']} s shW={shuffles[variant]} "
                      f"n={r['n']} m={r['m']}", file=sys.stderr)
    if facts["D"] != facts["S"]:
        print(f"OUTPUT MISMATCH: D={facts['D']} S={facts['S']}",
              file=sys.stderr)
        return 1
    summary = {
        "sf_dir": sf_dir,
        "best_s": {v: min(t) for v, t in results.items()},
        "total_shuffle_write_mb": shuffles,
        "split_vs_default_ratio": round(
            min(results["S"]) / min(results["D"]), 3
        ),
        "split_facts": split_facts,
        "identical_output": True,
        "all_reps": results,
    }
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
