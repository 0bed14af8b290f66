#!/usr/bin/env python
"""Isolated probe: the ONE-TIME docvec vector-table build cost.

`docvec_ann_lsh` serves in ~137 s at sf100, but that number rides on a
persisted `hashed_doc_vectors` table built inside the same query — the
build was never measured in isolation (r9 verdict, What's missing #3).
A 100 TB consumer pays the build once per corpus snapshot and the serve
per query batch; this probe splits them:

- build: text -> tokens -> 64 signed conditional sums -> persist +
  count (the materialization a production system writes to storage);
- serve: the exact+LSH recall gate on the WARM table (cache hit).

Fresh JVM per scale, stage metrics from the REST diff, reps best-of.

  python scripts/docvec_build_probe.py [sf_dirs...] [--reps N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
sf_dir, out_path, reps = sys.argv[2], sys.argv[3], int(sys.argv[4])

from pyspark.sql import functions as F
from pywrangler_spark.session import get_spark
from pywrangler_spark.sources import read_parquet
from pywrangler_spark.operators.docvec import hashed_doc_vectors
from pywrangler_spark.operators.similarity import (
    suggest_ann_params, topk_cosine, topk_cosine_lsh,
)

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark("docvec-build-probe", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus),
                  extra_conf={"spark.driver.memory": "48g",
                              "spark.ui.enabled": "true",
                              "spark.ui.retainedStages": "20000"})
spark.sparkContext.setLogLevel("ERROR")
import bench
read_stages = bench._stage_metrics_reader(spark)

docs = read_parquet(
    spark, os.path.join(sf_dir, "documents.parquet")
).select("doc_id", "text")

result = {"build": [], "serve": []}
for rep in range(reps):
    vecs = docs.transform(
        hashed_doc_vectors("doc_id", "text", dim=64)
    ).persist()
    seen = set(read_stages()) if read_stages else set()
    t0 = time.perf_counter()
    n_vecs = vecs.count()
    t_build = time.perf_counter() - t0
    result["build"].append(round(t_build, 3))
    if read_stages and t_build == min(result["build"]):
        time.sleep(0.3)
        snap = read_stages()
        result["build_stage_metrics"] = bench._aggregate_stages(
            [s for sid, s in snap.items() if sid not in seen])
    result["n_vecs"] = n_vecs

    qf = (F.col("id") % 40 == 0) & (F.col("id") < 2000)
    exact = vecs.transform(
        topk_cosine("id", "doc_vec", k=10, query_filter=qf)
    ).select("query_id", "neighbor_id")
    n_tables = suggest_ann_params(n_vecs)["n_tables"]
    approx = vecs.transform(
        topk_cosine_lsh("id", "doc_vec", k=10, n_planes=8,
                        n_tables=n_tables, dim=64, query_filter=qf)
    ).select("query_id", "neighbor_id")
    per_q = (
        exact.join(approx.withColumn("_hit", F.lit(1)),
                   ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_exact"),
             F.count("_hit").alias("n_hit"))
        .select("query_id",
                (F.col("n_hit") / F.col("n_exact")).alias("recall"))
    )
    seen = set(read_stages()) if read_stages else set()
    t0 = time.perf_counter()
    row = per_q.agg(F.count(F.lit(1)).alias("n"),
                    F.avg("recall").alias("r")).collect()[0]
    t_serve = time.perf_counter() - t0
    result["serve"].append(round(t_serve, 3))
    if read_stages and t_serve == min(result["serve"]):
        time.sleep(0.3)
        snap = read_stages()
        result["serve_stage_metrics"] = bench._aggregate_stages(
            [s for sid, s in snap.items() if sid not in seen])
    result["n_queries"] = row["n"]
    result["recall"] = round(row["r"], 4)
    vecs.unpersist(blocking=True)
    spark.catalog.clearCache()

with open(out_path, "w") as fh:
    json.dump(result, fh)
"""


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 2
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    sf_dirs = args or [".scratch/sf10", ".scratch/sf100"]

    import tempfile

    workdir = tempfile.mkdtemp(prefix="docvec_build_")
    runner = os.path.join(workdir, "runner.py")
    with open(runner, "w") as fh:
        fh.write(_RUNNER)

    out_all: dict[str, dict] = {}
    for sf_dir in sf_dirs:
        out = os.path.join(workdir, f"{os.path.basename(sf_dir)}.json")
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, runner, REPO, sf_dir, out, str(reps)],
            capture_output=True, text=True, cwd=REPO,
        )
        if proc.returncode != 0 or not os.path.exists(out):
            print(proc.stdout[-2000:], proc.stderr[-2000:])
            return 1
        with open(out) as fh:
            r = json.load(fh)
        out_all[os.path.basename(sf_dir)] = r
        print(
            f"{sf_dir}: build best {min(r['build'])}s "
            f"serve best {min(r['serve'])}s n_vecs={r['n_vecs']} "
            f"recall={r['recall']} (wall {time.time() - t0:.0f}s)"
        )

    path = os.path.join(REPO, "bench_docvec_build_probe.json")
    with open(path, "w") as fh:
        json.dump({"probe": "docvec_build_vs_serve", "reps": reps,
                   "scales": out_all}, fh, indent=1)
    print("wrote", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
