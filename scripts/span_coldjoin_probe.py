#!/usr/bin/env python
"""Probe: the span family's sf100 cold-join cliff and its fix.

Diagnosis (r11): the synthetic corpus has NO gram in >= 100k distinct
docs (hot_vocab=0 at sf10 AND sf100 — wholesale x1000 replication
multiplies doc frequency but the max original d0 is < 100), so the
designed hot broadcast path never engages and every gram occurrence
reaches the cold join. At sf10 AQE still runtime-converts that join to
broadcast — the dup-count exchange (the build side's LAST materialized
stage) is 49.8 MB, under the adaptive threshold — so the gram stream
never shuffles. At sf100 the same exchange is 80.6 MB of COUNT
PARTIALS (the true post-agg set is ~238k rows, a few MB), AQE keeps
the sort-merge join, and the full 4.1 GB positional gram stream
shuffles: dedup_span_excise jumps 11.7 -> 208 s (17.7x for 10x data).

Fix F: materialize the dup set through its own exchange after the
aggregation+filter (repartitionByRange — same-key hash repartition
would be elided as redundant), so the stage AQE measures IS the true
vocab-bounded set and the broadcast decision is made on real bytes at
every scale. When the vocabulary genuinely outgrows the threshold the
join correctly stays shuffled — the fix changes measurement, not
policy.

  python scripts/span_coldjoin_probe.py [sf_dir] [reps] [out] [A,F]
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
from pywrangler_spark.functions.text import token_count
from pywrangler_spark.operators.spandedup import (
    _distinct_doc_grams, _positional_grams, _union_length,
    duplicate_span_stats,
)

N, MIN_DOCS, HOT = 5, 2, 100_000
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark("span-coldjoin-probe", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus),
                  extra_conf={"spark.driver.memory": "48g",
                              "spark.ui.enabled": "true"})
spark.sparkContext.setLogLevel("ERROR")
import bench
read_stages = bench._stage_metrics_reader(spark)

docs = read_parquet(
    spark, os.path.join(sf_dir, "documents.parquet")
).select("doc_id", "text")

if variant == "A":
    out = docs.transform(
        duplicate_span_stats("doc_id", "text", n=N, min_docs=MIN_DOCS,
                             hot_min_docs=HOT)
    )
elif variant == "D":
    # the shipped adaptive default (hot_min_docs=None)
    out = docs.transform(
        duplicate_span_stats("doc_id", "text", n=N, min_docs=MIN_DOCS)
    )
else:
    grams = _positional_grams(docs, "doc_id", "text", N)
    dup = (
        _distinct_doc_grams(docs, "doc_id", "text", N)
        .groupBy("_gh")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") >= MIN_DOCS)
    )
    if variant == "H":
        # corpus-relative hot threshold: _nd >= max(min_docs,
        # n_docs/5000); mass bound |hot| <= 5000 x avg grams/doc
        thr_df = docs.agg(
            F.greatest(
                F.lit(MIN_DOCS).cast("long"),
                F.ceil(F.count(F.lit(1)) / F.lit(5000)).cast("long"),
            ).alias("_hot_thr")
        )
        dup = dup.crossJoin(F.broadcast(thr_df))
        hot = dup.filter(F.col("_nd") >= F.col("_hot_thr")).select("_gh")
        cold = dup.filter(F.col("_nd") < F.col("_hot_thr")).select("_gh")
    else:
        dup = dup.repartitionByRange(F.col("_gh"))  # <- variant F
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
        F.col("doc_id"), token_count(F.col("text")).alias("_n_tok"))
    j = toks.join(masked, "doc_id", "left")
    nm = F.coalesce(F.col("n_masked"), F.lit(0)).cast("long")
    out = j.select(
        "doc_id",
        nm.alias("n_masked"),
        F.when(F.col("_n_tok") > 0, nm / F.col("_n_tok"))
        .otherwise(F.lit(0.0)).alias("dup_ratio"),
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
               "total_shuffle_write_mb": sh_w}, fh)
"""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf100"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    out_path = sys.argv[3] if len(sys.argv) > 3 else "span_coldjoin_probe.json"
    variants = tuple(
        sys.argv[4].split(",")) if len(sys.argv) > 4 else ("A", "F")
    results = {v: [] for v in variants}
    shuffles = {v: None for v in variants}
    facts: dict = {}
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
                key = (r["n"], r["m"], r["r"])
                facts.setdefault(variant, key)
                print(f"{variant}: {r['wall_s']} s shW={shuffles[variant]} "
                      f"n={r['n']} m={r['m']}", file=sys.stderr)
    base = variants[0]
    for v in variants[1:]:
        if facts[base] != facts[v]:
            print(f"OUTPUT MISMATCH: {base}={facts[base]} {v}={facts[v]}",
                  file=sys.stderr)
            return 1
    summary = {
        "sf_dir": sf_dir,
        "best_s": {v: min(t) for v, t in results.items()},
        "total_shuffle_write_mb": shuffles,
        "ratios_vs_A": {v: round(min(t) / min(results[base]), 3)
                        for v, t in results.items()},
        "identical_output": True,
        "all_reps": results,
    }
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
