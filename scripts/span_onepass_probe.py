#!/usr/bin/env python
"""Probe: one-scan restructure of the span-dedup pipeline.

The sf10 stage table (span_pos_sf10.json) shows the family's cost is
THREE tokenize+shingle scan passes (~89% of task-time; all exchanges
<150 MB): the positional stream is referenced twice (hot probe + cold
join — Spark re-executes lineage per reference) and the doc-frequency
count runs a third scan-side-distinct pass. The gram-construction A/B
(span_gram_probe.json) showed per-pass cost is NOT fixable by swapping
the shingle lambda for codegen window leads (1.33x slower) — the win
must come from running FEWER passes.

Variant R: materialize the positional gram stream ONCE behind an
explicit wide doc-keyed exchange (the chunk_content_defined precedent)
and let every consumer read the shuffle files via ReuseExchange:

  * hot probe + cold join both read the exchange (no re-scan);
  * doc-frequency derives from the SAME exchange: dropDuplicates on
    (_id,_gh) needs NO new exchange (hash-partitioning by _id
    satisfies clustering by (_id,_gh)), then the vocab-bounded
    map-side-combined count per _gh — post-hash dedup, i.e. exactly
    the pre-r10 count_distinct semantics;
  * hot hits stay _id-partitioned through the broadcast probe, so
    their collect_set(_pos) aggregates with ZERO exchange; cold hits
    aggregate after their (small) gram-keyed join and the two partial
    position arrays merge on an already-partitioned full join.

Output equality vs the current operator is asserted per run
(count / sum(n_masked) / sum(round(dup_ratio,6))).

  python scripts/span_onepass_probe.py [sf_dir] [reps] [out.json]
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
    _positional_grams, _union_length, duplicate_span_stats,
)
from pywrangler_spark.util import wide_exchange_width

N, MIN_DOCS, HOT = 5, 2, 100_000
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark("span-onepass-probe", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus),
                  extra_conf={"spark.driver.memory": "48g",
                              "spark.ui.enabled": "true"})
spark.sparkContext.setLogLevel("ERROR")

docs = read_parquet(
    spark, os.path.join(sf_dir, "documents.parquet")
).select("doc_id", "text")

if variant == "A":
    out = docs.transform(
        duplicate_span_stats("doc_id", "text", n=N, min_docs=MIN_DOCS,
                             hot_min_docs=HOT)
    )
else:
    g = _positional_grams(docs, "doc_id", "text", N).repartition(
        wide_exchange_width(spark), "_id"
    )
    # doc frequency from the SAME exchange: post-hash per-doc dedup
    # (no new exchange: partitioning by _id satisfies (_id,_gh)).
    # Variant S keeps _pos alive through the dedup (min aggregate) so
    # column pruning cannot specialize this branch's exchange schema —
    # identical schema => AQE stage reuse => the gram scan runs ONCE.
    if variant == "S":
        dup = (
            g.groupBy("_id", "_gh")
            .agg(F.min("_pos").alias("_p0"))
            .groupBy("_gh")
            .agg(F.count(F.lit(1)).alias("_nd"))
            .filter(F.col("_nd") >= MIN_DOCS)
        )
    else:
        dup = (
            g.dropDuplicates(["_id", "_gh"])
            .groupBy("_gh")
            .agg(F.count(F.lit(1)).alias("_nd"))
            .filter(F.col("_nd") >= MIN_DOCS)
        )
    hot = dup.filter(F.col("_nd") >= HOT).select("_gh")
    cold = dup.filter(F.col("_nd") < HOT).select("_gh")
    hot_hits = g.join(F.broadcast(hot), "_gh")
    cold_hits = g.join(cold, "_gh")
    hot_agg = hot_hits.groupBy("_id").agg(
        F.collect_set("_pos").alias("_hp_h"))
    cold_agg = cold_hits.groupBy("_id").agg(
        F.collect_set("_pos").alias("_hp_c"))
    hp = (
        hot_agg.join(cold_agg, "_id", "full")
        .select(
            "_id",
            F.sort_array(
                F.array_distinct(
                    F.concat(
                        F.coalesce(F.col("_hp_h"),
                                   F.array().cast("array<int>")),
                        F.coalesce(F.col("_hp_c"),
                                   F.array().cast("array<int>")),
                    )
                )
            ).alias("_hp"),
        )
    )
    masked = hp.select(
        F.col("_id").alias("doc_id"),
        _union_length(F.col("_hp"), N).alias("n_masked"),
    )
    toks = docs.select(
        F.col("doc_id"), token_count(F.col("text")).alias("_n_tok"))
    j = toks.join(masked, "doc_id", "left")
    n_masked = F.coalesce(F.col("n_masked"), F.lit(0)).cast("long")
    out = j.select(
        "doc_id",
        n_masked.alias("n_masked"),
        F.when(F.col("_n_tok") > 0, n_masked / F.col("_n_tok"))
        .otherwise(F.lit(0.0)).alias("dup_ratio"),
    )

t0 = time.perf_counter()
row = out.agg(
    F.count(F.lit(1)).alias("n"),
    F.sum("n_masked").alias("m"),
    F.sum(F.round(F.col("dup_ratio"), 6)).alias("r"),
).collect()[0]
elapsed = time.perf_counter() - t0
with open(out_path, "w") as fh:
    json.dump({"variant": variant, "wall_s": round(elapsed, 2),
               "n": row.n, "m": int(row.m), "r": round(float(row.r), 3)},
              fh)
"""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    out_path = sys.argv[3] if len(sys.argv) > 3 else "span_onepass_probe.json"
    VARIANTS = tuple(sys.argv[4].split(",")) if len(sys.argv) > 4 else ("A", "R")
    results = {v: [] for v in VARIANTS}
    facts: dict = {}
    with tempfile.TemporaryDirectory() as td:
        runner = os.path.join(td, "runner.py")
        with open(runner, "w") as fh:
            fh.write(_RUNNER)
        for _ in range(reps):
            for variant in VARIANTS:
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
                key = (r["n"], r["m"], r["r"])
                facts.setdefault(variant, key)
                print(f"{variant}: {r['wall_s']} s  n={r['n']} m={r['m']}",
                      file=sys.stderr)
    base = VARIANTS[0]
    for v in VARIANTS[1:]:
        if facts[base] != facts[v]:
            print(f"OUTPUT MISMATCH: {base}={facts[base]} {v}={facts[v]}",
                  file=sys.stderr)
            return 1
    summary = {
        "sf_dir": sf_dir,
        "best_s": {v: min(t) for v, t in results.items()},
        "ratios_vs_A": {v: round(min(t) / min(results[VARIANTS[0]]), 3)
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
