#!/usr/bin/env python
"""Probe: the containment family's scale behavior (operators/dedup.py
``ContainmentPairs``), measured two ways per scale dir:

RAW — the operator alone on the replicated corpus. make_scale
replicates documents VERBATIM (ids shifted), so every shingle's
document frequency multiplies by the replication factor: at low
replication the replica cliques explode the pair output quadratically;
past ``max_df`` the cap drops every shingle and the output collapses to
zero. Both are artifacts of verbatim replication, not operator defects
— recorded here as kept-shingle / pair counts so the cliff is measured,
not argued.

COMPOSED — the pipeline-correct form the operator docstring prescribes:
exact-dedup first, containment on the survivors. Exact dedup collapses
verbatim replicas back to the distinct corpus, so the containment core
(shingle cache + df cap + self-join) sees a bounded input while the
scan + fingerprint aggregation grow with the corpus — the composed wall
should grow sub-linearly with sf. Best-of-N walls + stage totals.

  python scripts/containment_scale_probe.py [out] [reps] sf_dir...
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
sf_dir, out_path, reps = sys.argv[2], sys.argv[3], int(sys.argv[4])

from pyspark.sql import functions as F
from pywrangler_spark.session import get_spark
from pywrangler_spark.sources import read_parquet
from pywrangler_spark.operators.dedup import (
    ContainmentPairs, dedup_exact,
)

MAX_DF, THRESHOLD = 20, 0.9
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark("containment-scale-probe", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus),
                  extra_conf={"spark.driver.memory": "48g",
                              "spark.ui.enabled": "true"})
spark.sparkContext.setLogLevel("ERROR")
import bench
read_stages = bench._stage_metrics_reader(spark)

docs = read_parquet(
    spark, os.path.join(sf_dir, "documents.parquet")
).select("doc_id", "text", "lang", "source", "n_chars")

result = {"sf_dir": sf_dir, "max_df": MAX_DF, "threshold": THRESHOLD,
          "n_rows": docs.count()}

# ---- RAW facts: the verbatim-replication artifact, measured ---------------
op = ContainmentPairs("doc_id", "text", threshold=THRESHOLD, max_df=MAX_DF)
raw = docs.transform(op)
result["raw_pairs"] = raw.count()
# kept-shingle universe size after the df cap (the capped stream is the
# second persisted cache)
result["raw_kept_shingle_rows"] = op._persisted[-1].count()
op.release()

# ---- COMPOSED: exact-dedup -> containment, best-of-N wall -----------------
walls = []
for i in range(reps):
    seen = set(read_stages()) if read_stages else set()
    t0 = time.perf_counter()
    out = docs.transform(dedup_exact("doc_id", "text")).transform(
        ContainmentPairs("doc_id", "text",
                         threshold=THRESHOLD, max_df=MAX_DF)
    )
    out.write.format("noop").mode("overwrite").save()
    walls.append(round(time.perf_counter() - t0, 3))
    if read_stages and walls[-1] == min(walls):
        time.sleep(0.3)
        snap = read_stages()
        result["stage_metrics"] = bench._aggregate_stages(
            [s for sid, s in snap.items() if sid not in seen])
    spark.catalog.clearCache()
result["composed_wall_reps"] = walls
result["composed_pairs"] = (
    docs.transform(dedup_exact("doc_id", "text")).transform(
        ContainmentPairs("doc_id", "text",
                         threshold=THRESHOLD, max_df=MAX_DF)
    ).count()
)
with open(out_path, "w") as fh:
    json.dump(result, fh)
"""


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "containment_scale.json"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dirs = sys.argv[3:] or [
        "/root/testdata/sf0.1",
        os.path.join(REPO, ".scratch/sf1"),
        os.path.join(REPO, ".scratch/sf10"),
    ]
    workdir = tempfile.mkdtemp(prefix="containment_probe_")
    runner = os.path.join(workdir, "runner.py")
    with open(runner, "w") as fh:
        fh.write(_RUNNER)
    results = []
    env = dict(os.environ, SPARK_GRAFT_ALLOW_PARTIAL="1")
    for sf_dir in sf_dirs:
        rout = os.path.join(workdir, "r.json")
        if os.path.exists(rout):
            os.unlink(rout)
        proc = subprocess.run(
            [sys.executable, runner, REPO, sf_dir, rout, str(reps)],
            stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        if not os.path.exists(rout):
            results.append({"sf_dir": sf_dir,
                            "error": (proc.stderr or "died")[-500:]})
            continue
        with open(rout) as fh:
            results.append(json.load(fh))
        print(results[-1], file=sys.stderr)
    with open(os.path.join(REPO, out), "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({"probe": "containment_scale", "out": out,
                      "n_dirs": len(results)}))


if __name__ == "__main__":
    main()
