#!/usr/bin/env python
"""Pin the sf1000 span-family spill to its real stage.

The raised-shuffle-partition rep (bench_span_sf1000_parts256_r12.json)
refuted the reduce-side attribution: spill is byte-identical
(82,123.2 MB) at 32 and 256 shuffle partitions, for mask AND excise —
a deterministic, shared, shuffle-free stage. The only such stage is the
scan-side tokenize→shingle→position pass, whose task count is set by
INPUT SPLITS (maxPartitionBytes/openCostInBytes), not by shuffle
partitions. This probe reruns one query with smaller scan splits and
records per-stage spill so the attribution is measured, not argued.

Usage: python scripts/span_spill_probe.py <sf_dir> <query> <maxPartitionBytes> [out]
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
sf_dir, query, mpb, out_path = sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5]
from pywrangler_spark.queries import QUERIES
from pywrangler_spark.session import get_spark
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark("span-spill-probe", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus),
                  extra_conf={"spark.driver.memory": "48g",
                              "spark.ui.enabled": "true",
                              "spark.ui.retainedStages": "20000",
                              "spark.sql.files.maxPartitionBytes": mpb})
spark.sparkContext.setLogLevel("ERROR")
import bench
read_stages = bench._stage_metrics_reader(spark)
seen = set(read_stages()) if read_stages else set()
t0 = time.perf_counter()
QUERIES[query](spark, sf_dir).write.format("noop").mode("overwrite").save()
wall = round(time.perf_counter() - t0, 3)
time.sleep(0.5)
result = {"query": query, "maxPartitionBytes": mpb, "wall_s": wall}
if read_stages:
    snap = read_stages()
    fresh = {sid: s for sid, s in snap.items() if sid not in seen}
    result["stage_metrics"] = bench._aggregate_stages(list(fresh.values()))
    # per-stage detail for the spillers: which stage, how many tasks
    detail = []
    for sid, s in fresh.items():
        row = {k: s.get(k) for k in
               ("numTasks", "memoryBytesSpilled", "diskBytesSpilled",
                "shuffleReadBytes", "shuffleWriteBytes", "inputBytes",
                "name")}
        row["stage"] = sid
        if (s.get("memoryBytesSpilled") or 0) > 0 or \
           (s.get("inputBytes") or 0) > 1 << 28:
            detail.append(row)
    result["spilling_or_big_stages"] = detail
with open(out_path, "w") as fh:
    json.dump(result, fh)
"""


def main() -> None:
    sf_dir, query, mpb = sys.argv[1], sys.argv[2], sys.argv[3]
    out = sys.argv[4] if len(sys.argv) > 4 else "span_spill_probe.json"
    workdir = tempfile.mkdtemp(prefix="span_spill_")
    runner = os.path.join(workdir, "runner.py")
    with open(runner, "w") as fh:
        fh.write(_RUNNER)
    rout = os.path.join(workdir, "r.json")
    env = dict(os.environ, SPARK_GRAFT_ALLOW_PARTIAL="1")
    subprocess.run(
        [sys.executable, runner, REPO, sf_dir, query, mpb, rout],
        stderr=subprocess.DEVNULL, check=True, env=env,
    )
    with open(rout) as fh:
        result = json.load(fh)
    with open(os.path.join(REPO, out), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result)[:2000])


if __name__ == "__main__":
    main()
