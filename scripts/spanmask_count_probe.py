#!/usr/bin/env python
"""Isolated probe: the dup-gram COUNT side of the span-mask pipeline.

The r9 sf100 probe left `dedup_span_mask` as the decade max (9.2x,
shuffle 413 MB -> 10.2 GB = 24.7x for 10x data — superlinear). Half of
that shuffle is the doc-frequency aggregation: `count_distinct(_id)`
over the positional gram stream plans as the two-phase distinct
rewrite, whose exchange carries every distinct (gram, doc) PAIR — a
stream that grows linearly with the corpus even though the gram
VOCABULARY it is counting does not (replicated/boilerplate corpora:
new docs, same grams).

Variant B moves the dedup scan-side: `shingles_from_words(...,
distinct=True)` emits each doc's distinct grams once, so the pairs are
unique BY CONSTRUCTION and the aggregation is a plain `count` — a
partial_count that map-side-combines to one (gram, n) row per mapper
per distinct gram. Its exchange is bounded by mappers x vocabulary,
INDEPENDENT of corpus replication. The join/hit side is unchanged
(identical results; the oracle pins them).

Method: each (variant, rep) in a FRESH JVM subprocess, variants
alternating inside one host window (A B A B ...), best-of-reps, stage
metrics from the UI REST diff as in bench.py.

  python scripts/spanmask_count_probe.py [sf_dir] [reps] [out.json]
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
variant, sf_dir, out_path = sys.argv[2], sys.argv[3], sys.argv[4]

from pyspark.sql import functions as F
from pywrangler_spark.session import get_spark
from pywrangler_spark.sources import read_parquet
from pywrangler_spark.functions.hashing import hash56
from pywrangler_spark.functions.text import (
    shingles_from_words, token_count, words,
)
from pywrangler_spark.operators.spandedup import (
    _positional_grams, _union_length, duplicate_span_stats,
)

N, MIN_DOCS, HOT = 5, 2, 100_000
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark("spanmask-count-probe", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus),
                  extra_conf={"spark.driver.memory": "48g",
                              "spark.ui.enabled": "true",
                              "spark.ui.retainedStages": "20000"})
spark.sparkContext.setLogLevel("ERROR")

docs = read_parquet(
    spark, os.path.join(sf_dir, "documents.parquet")
).select("doc_id", "text")

if variant == "A":
    out = docs.transform(
        duplicate_span_stats("doc_id", "text", n=N, min_docs=MIN_DOCS)
    )
else:
    # B: count side from scan-side-distinct grams (plain count);
    # join/hit side identical to _hit_position_sets
    grams = _positional_grams(docs, "doc_id", "text", N)
    tokenized = docs.select(
        F.col("doc_id").alias("_id"), words(F.col("text")).alias("_w")
    )
    distinct_pairs = tokenized.filter(F.size("_w") >= N).select(
        "_id",
        F.explode(
            shingles_from_words(F.col("_w"), N, distinct=True)
        ).alias("_g"),
    ).filter(F.col("_g") != "")
    dup = (
        distinct_pairs.select(hash56(F.col("_g")).alias("_gh"))
        .groupBy("_gh")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") >= MIN_DOCS)
    )
    hot = dup.filter(F.col("_nd") >= HOT).select("_gh")
    cold = dup.filter(F.col("_nd") < HOT).select("_gh")
    hits = grams.join(F.broadcast(hot), "_gh").unionByName(
        grams.join(cold, "_gh")
    )
    hp = hits.groupBy("_id").agg(
        F.sort_array(F.collect_set("_pos")).alias("_hp")
    )
    masked = hp.select(
        F.col("_id").alias("doc_id"),
        _union_length(F.col("_hp"), N).alias("n_masked"),
    )
    toks = docs.select(
        "doc_id", token_count(F.col("text")).alias("_n_tok")
    )
    j = toks.join(masked, "doc_id", "left")
    nm = F.coalesce(F.col("n_masked"), F.lit(0)).cast("long")
    out = j.select(
        "doc_id",
        nm.alias("n_masked"),
        F.when(F.col("_n_tok") > 0, nm / F.col("_n_tok"))
        .otherwise(F.lit(0.0))
        .alias("dup_ratio"),
    )

import bench
read_stages = bench._stage_metrics_reader(spark)
seen = set(read_stages()) if read_stages else set()
t0 = time.perf_counter()
row = out.agg(
    F.sum("n_masked").alias("s"),
    F.sum(F.hash("doc_id", "n_masked", "dup_ratio")
          .cast("long")).alias("h"),
    F.count(F.lit(1)).alias("c"),
).collect()[0]
elapsed = time.perf_counter() - t0
result = {"sec": round(elapsed, 3),
          "sum_masked": row["s"], "hash": row["h"], "rows": row["c"]}
if read_stages:
    time.sleep(0.3)
    snap = read_stages()
    result["stage_metrics"] = bench._aggregate_stages(
        [s for sid, s in snap.items() if sid not in seen])
with open(out_path, "w") as fh:
    json.dump(result, fh)
"""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    out_json = (
        sys.argv[3]
        if len(sys.argv) > 3
        else f"bench_spanmask_count_probe_{os.path.basename(sf_dir)}.json"
    )

    import tempfile

    workdir = tempfile.mkdtemp(prefix="spanmask_probe_")
    runner = os.path.join(workdir, "runner.py")
    with open(runner, "w") as fh:
        fh.write(_RUNNER)

    results: dict[str, dict] = {"A": {"reps": []}, "B": {"reps": []}}
    for rep in range(reps):
        for variant in ("A", "B"):
            out = os.path.join(workdir, f"{variant}_{rep}.json")
            t0 = time.time()
            proc = subprocess.run(
                [sys.executable, runner, REPO, variant, sf_dir, out],
                capture_output=True,
                text=True,
                cwd=REPO,
            )
            if proc.returncode != 0 or not os.path.exists(out):
                print(proc.stdout[-2000:], proc.stderr[-2000:])
                return 1
            with open(out) as fh:
                r = json.load(fh)
            results[variant]["reps"].append(r["sec"])
            for k in ("sum_masked", "hash", "rows"):
                results[variant][k] = r[k]
            if r["sec"] == min(results[variant]["reps"]):
                results[variant]["stage_metrics"] = r.get("stage_metrics")
            print(
                f"{variant} rep{rep}: {r['sec']}s "
                f"(wall {time.time() - t0:.0f}s) "
                f"shuffle_w={r.get('stage_metrics', {}).get('shuffle_write_mb')} "
                f"spill={r.get('stage_metrics', {}).get('spill_mb')}"
            )

    same = all(
        results["A"][k] == results["B"][k]
        for k in ("sum_masked", "hash", "rows")
    )
    summary = {
        "probe": "spanmask_count_side",
        "sf_dir": sf_dir,
        "results_identical": same,
        "best": {v: min(r["reps"]) for v, r in results.items()},
        "variants": results,
    }
    with open(os.path.join(REPO, out_json), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({k: summary[k] for k in ("results_identical", "best")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
