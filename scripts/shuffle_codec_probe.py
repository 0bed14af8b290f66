#!/usr/bin/env python
"""A/B: spark.io.compression.codec lz4 (default) vs zstd (guide §2.3).

The codec is fixed at SparkContext creation, so each (arm, rep) runs in
a fresh subprocess JVM; arms alternate so host drift hits both. Queries
are the suite's largest shufflers at sf1 (shuffle MB from the bench
stage telemetry). Timing is per-query inside the child (noop sink),
after a warm-up scan — session bring-up is excluded.

Usage: python scripts/shuffle_codec_probe.py [reps=3] [--sf DIR] [--out FILE]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "approx_quantiles_prices",
    "q21_waiting_supplier",
    "dedup_containment",
    "dedup_cdc_chunks",
    "interval_global_timeline",
]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
codec, sf_dir = sys.argv[2], sys.argv[3]
names = sys.argv[4].split(",")
from pywrangler_spark.queries import QUERIES
from pywrangler_spark.session import get_spark
from pywrangler_spark.sources import read_parquet

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark(
    "codec-ab", master=f"local[{cpus}]", shuffle_partitions=int(cpus),
    extra_conf={"spark.driver.memory": "48g",
                "spark.io.compression.codec": codec})
spark.sparkContext.setLogLevel("ERROR")
read_parquet(spark, os.path.join(sf_dir, "lineitem.parquet")).count()
out = {}
for n in names:
    spark.sparkContext.setJobDescription(f"codec-ab {codec} {n}")
    df = QUERIES[n](spark, sf_dir)
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    out[n] = round(time.monotonic() - t0, 3)
print("CODECAB " + json.dumps(out))
"""


def main() -> None:
    argv = list(sys.argv[1:])

    def opt(name, default):
        if name in argv:
            i = argv.index(name)
            v = argv[i + 1]
            del argv[i:i + 2]
            return v
        return default

    sf_dir = opt("--sf", os.path.join(REPO, ".scratch", "sf1"))
    out_path = opt("--out", "/tmp/shuffle_codec_probe.json")
    reps = int(argv[0]) if argv else 3

    times: dict = {c: {n: [] for n in QUERIES} for c in ("lz4", "zstd")}
    child_src = "/tmp/_codec_ab_child.py"
    with open(child_src, "w") as fh:
        fh.write(_CHILD)
    for r in range(reps):
        for codec in ("lz4", "zstd"):
            p = subprocess.run(
                [sys.executable, child_src, REPO, codec, sf_dir,
                 ",".join(QUERIES)],
                capture_output=True, text=True,
            )
            line = [ln for ln in p.stdout.splitlines()
                    if ln.startswith("CODECAB ")]
            if not line:
                print(f"rep {r} {codec}: child failed\n{p.stderr[-2000:]}",
                      file=sys.stderr)
                sys.exit(1)
            got = json.loads(line[0][len("CODECAB "):])
            for n, t in got.items():
                times[codec][n].append(t)
            print(f"rep {r} {codec}: {got}", flush=True)

    result = {
        "metric": "shuffle_codec_ab", "sf_dir": sf_dir, "reps": times,
        "min": {c: {n: min(ts) for n, ts in qs.items()}
                for c, qs in times.items()},
    }
    result["ratio_zstd_over_lz4"] = {
        n: round(result["min"]["zstd"][n] / result["min"]["lz4"][n], 3)
        for n in QUERIES
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result["ratio_zstd_over_lz4"]))


if __name__ == "__main__":
    main()
