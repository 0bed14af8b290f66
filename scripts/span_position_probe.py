#!/usr/bin/env python
"""Phase breakdown of the span-dedup pipeline: where does the time and
shuffle actually sit AFTER the r10 count-side fix?

The r9 probe's untried half (r10 verdict ask #3) is the POSITION side:
the per-occurrence gram stream (`_positional_grams`) and the doc-keyed
`collect_set(_pos)` exchange (`_hit_position_sets`). The hypothesis to
test before designing any fix: repeated boilerplate yields long
consecutive hit-position runs, so that exchange carries arrays of
positions a (start, len) run-length encoding would shrink ~100x.

This probe attributes per-STAGE wall time / shuffle read / shuffle
write / input bytes for one fresh-JVM run of a span query, so the
pipeline's phases (tokenize+scan passes, cold gram join, doc-keyed
position aggregation, final stats join) can be read off the stage
table instead of guessed.

  python scripts/span_position_probe.py [query] [sf_dir] [out.json]
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
name, sf_dir, out_path = sys.argv[2], sys.argv[3], sys.argv[4]

from pywrangler_spark.queries import QUERIES
from pywrangler_spark.session import get_spark
import bench

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark("span-position-probe", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus),
                  extra_conf={"spark.driver.memory": "48g",
                              "spark.ui.enabled": "true",
                              "spark.ui.retainedStages": "20000"})
spark.sparkContext.setLogLevel("ERROR")
read_stages = bench._stage_metrics_reader(spark)

t0 = time.perf_counter()
QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
elapsed = time.perf_counter() - t0
time.sleep(0.5)
rows = []
for sid, s in sorted(read_stages().items()):
    rows.append({
        "stage": sid,
        "name": (s.get("name") or "")[:80],
        "status": s.get("status"),
        "tasks": s.get("numCompleteTasks"),
        "ms": s.get("executorRunTime"),
        "input_mb": round(s.get("inputBytes", 0) / 2**20, 1),
        "sh_read_mb": round(s.get("shuffleReadBytes", 0) / 2**20, 1),
        "sh_write_mb": round(s.get("shuffleWriteBytes", 0) / 2**20, 1),
        "spill_mb": round((s.get("memoryBytesSpilled", 0)
                           + s.get("diskBytesSpilled", 0)) / 2**20, 1),
    })
with open(out_path, "w") as fh:
    json.dump({"query": name, "sf_dir": sf_dir,
               "wall_s": round(elapsed, 2), "stages": rows}, fh, indent=1)
"""


def main() -> int:
    name = sys.argv[1] if len(sys.argv) > 1 else "dedup_span_mask"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf10"
    out = sys.argv[3] if len(sys.argv) > 3 else "span_position_stages.json"
    with tempfile.TemporaryDirectory() as td:
        runner = os.path.join(td, "runner.py")
        with open(runner, "w") as fh:
            fh.write(_RUNNER)
        proc = subprocess.run(
            [sys.executable, runner, REPO, name, sf_dir, out],
            stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, text=True,
        )
        if proc.returncode != 0:
            print(proc.stderr[-2000:], file=sys.stderr)
            return 1
    with open(out) as fh:
        data = json.load(fh)
    print(f"{data['query']} @ {data['sf_dir']}: {data['wall_s']} s")
    rows = sorted(data["stages"], key=lambda r: -(r["ms"] or 0))
    hdr = f"{'stage':>5} {'ms':>8} {'tasks':>5} {'in_mb':>8} " \
          f"{'shR_mb':>8} {'shW_mb':>8} {'spill':>6}  name"
    print(hdr)
    for r in rows[:14]:
        print(f"{r['stage']:>5} {r['ms'] or 0:>8} {r['tasks'] or 0:>5} "
              f"{r['input_mb']:>8} {r['sh_read_mb']:>8} "
              f"{r['sh_write_mb']:>8} {r['spill_mb']:>6}  {r['name']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
