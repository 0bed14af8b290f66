"""Instrumentation for the r13 serve-trio adjudication: under each value
of ``canChangeCachedPlanOutputPartitioning``, record (a) the partition
count the persisted frames actually materialize with, and (b) the
per-stage task counts of one serve query run — the mechanism check
behind the wall-clock toggle A/B (``flag_toggle_probe.py``).

Fresh subprocess per flag value. Usage:
  python scripts/cachedplan_partitions_probe.py --out probe.json
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
import json, os, sys, time, urllib.request
sys.path.insert(0, sys.argv[1])
flag_val, out_path = sys.argv[2], sys.argv[3]
from pyspark.sql import functions as F
from pywrangler_spark.session import get_spark
from pywrangler_spark.sources import read_parquet

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark("cachedplan-probe", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus),
                  extra_conf={
        "spark.driver.memory": "48g",
        "spark.ui.enabled": "true",
        "spark.ui.retainedStages": "20000",
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning":
            flag_val,
    })
spark.sparkContext.setLogLevel("ERROR")
rec = {"flag": flag_val}

# --- the docvec serve vector cache (queries/text.py docvec_ann_lsh_serve)
from pywrangler_spark.operators.docvec import hashed_doc_vectors
docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
vecs = docs.transform(hashed_doc_vectors("doc_id", "text", dim=64)).persist()
n = vecs.count()
rec["docvec_rows"] = n
rec["docvec_cached_partitions"] = vecs.rdd.getNumPartitions()

# --- the neardup normalized-projection cache (operators/similarity.py
#     cosine_neardup_pairs over the capped embeddings slice)
from pywrangler_spark.operators.similarity import _normed_vectors
emb = read_parquet(spark, os.path.join(sf_dir, "embeddings.parquet"))
base = _normed_vectors(
    emb.filter(F.col("vec_id") < 2000), "vec_id", "embedding").persist()
rec["neardup_rows"] = base.count()
rec["neardup_cached_partitions"] = base.rdd.getNumPartitions()
spark.catalog.clearCache()

# --- full docvec_ann_lsh_serve run with per-stage task counts
from pywrangler_spark.queries import QUERIES
api = (f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
       f"{spark.sparkContext.applicationId}/stages")
def stages():
    with urllib.request.urlopen(api, timeout=5) as r:
        return {s["stageId"]: s for s in json.load(r)}
seen = set(stages())
t0 = time.perf_counter()
QUERIES["docvec_ann_lsh_serve"](spark, sf_dir).write.format("noop").mode(
    "overwrite").save()
rec["serve_wall_sec"] = round(time.perf_counter() - t0, 3)
time.sleep(0.5)
new = [s for sid, s in stages().items() if sid not in seen]
rec["serve_stage_tasks"] = sorted(
    (s.get("numCompleteTasks", 0) for s in new), reverse=True)
rec["serve_n_stages"] = len(new)
with open(out_path, "w") as fh:
    json.dump(rec, fh)
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    workdir = tempfile.mkdtemp(prefix="cachedplan_probe_")
    runner = os.path.join(workdir, "runner.py")
    with open(runner, "w") as fh:
        fh.write(_RUNNER)
    out = {}
    for val in ("true", "false"):
        path = os.path.join(workdir, f"res_{val}.json")
        subprocess.check_call(
            [sys.executable, runner, REPO, val, path],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        with open(path) as fh:
            out[val] = json.load(fh)
    with open(os.path.join(REPO, args.out), "w") as fh:
        json.dump(out, fh)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
