#!/usr/bin/env python
"""Probe: is the span family's cost the INTERPRETED shingle lambda?

The sf10 stage table (span_pos_sf10.json) shows ~89% of
dedup_span_mask's task-time in three scan passes and <150 MB of
shuffle — the positional stream's exchange is NOT the cost; building
the gram strings is. `shingles_from_words` maps a higher-order
`F.transform` lambda over every position (CodegenFallback: every
element evaluates interpreted — the documented chunk.py trap,
`operators/chunk.py` docstring).

Variant W builds the SAME gram strings with whole-stage-codegen ops:
posexplode the token array to per-token rows, then `lead()` over a
doc-keyed window + concat_ws — one extra doc-keyed exchange of token
rows, zero interpreted lambdas, bit-identical gram text (verified by
count + hash checksum).

Each variant runs in a fresh JVM, alternating A W A W in one window.

  python scripts/span_gram_probe.py [sf_dir] [reps] [out.json]
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
from pyspark.sql.window import Window
from pywrangler_spark.session import get_spark
from pywrangler_spark.sources import read_parquet
from pywrangler_spark.functions.hashing import hash56
from pywrangler_spark.functions.text import words
from pywrangler_spark.operators.spandedup import _positional_grams

N = 5
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark("span-gram-probe", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus),
                  extra_conf={"spark.driver.memory": "48g"})
spark.sparkContext.setLogLevel("ERROR")

docs = read_parquet(
    spark, os.path.join(sf_dir, "documents.parquet")
).select("doc_id", "text")

if variant == "A":
    grams = _positional_grams(docs, "doc_id", "text", N)
else:
    toks = docs.select(
        F.col("doc_id").alias("_id"),
        F.posexplode(words(F.col("text"))).alias("_pos", "_tok"),
    ).filter(F.col("_tok") != "")
    w = Window.partitionBy("_id").orderBy("_pos")
    gram_txt = F.concat_ws(
        " ",
        F.col("_tok"),
        *[F.lead("_tok", j).over(w) for j in range(1, N)],
    )
    grams = (
        toks.select(
            "_id", "_pos",
            gram_txt.alias("_g"),
            F.lead("_tok", N - 1).over(w).alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .select("_id", "_pos", hash56(F.col("_g")).alias("_gh"))
    )

t0 = time.perf_counter()
row = grams.agg(
    F.count(F.lit(1)).alias("n"),
    F.sum(F.col("_gh") % 1000003).alias("chk"),
    F.sum(F.col("_pos").cast("long")).alias("pchk"),
).collect()[0]
elapsed = time.perf_counter() - t0
with open(out_path, "w") as fh:
    json.dump({"variant": variant, "wall_s": round(elapsed, 2),
               "n": row.n, "chk": int(row.chk), "pchk": int(row.pchk)}, fh)
"""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    out_path = sys.argv[3] if len(sys.argv) > 3 else "span_gram_probe.json"
    results = {"A": [], "W": []}
    facts: dict = {}
    with tempfile.TemporaryDirectory() as td:
        runner = os.path.join(td, "runner.py")
        with open(runner, "w") as fh:
            fh.write(_RUNNER)
        for _ in range(reps):
            for variant in ("A", "W"):
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
                key = (r["n"], r["chk"], r["pchk"])
                facts.setdefault(variant, key)
                if facts[variant] != key:
                    print(f"NONDETERMINISTIC {variant}: {facts[variant]} "
                          f"vs {key}", file=sys.stderr)
                    return 1
                print(f"{variant}: {r['wall_s']} s  n={r['n']}",
                      file=sys.stderr)
    if facts["A"] != facts["W"]:
        print(f"OUTPUT MISMATCH: A={facts['A']} W={facts['W']}",
              file=sys.stderr)
        return 1
    summary = {
        "sf_dir": sf_dir,
        "best_A_s": min(results["A"]),
        "best_W_s": min(results["W"]),
        "ratio_W_over_A": round(min(results["W"]) / min(results["A"]), 3),
        "identical_output": True,
        "n_grams": facts["A"][0],
        "all_reps": results,
    }
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
