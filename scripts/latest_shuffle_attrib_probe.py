#!/usr/bin/env python
"""Settle the sf200 shuffle-growth attribution for latest_event_per_user.

r11 measured compressed shuffle 2047 → 5869 MB for 2× data (sf100 →
sf200 events) and ASSERTED the split as "payload-linear ~2.1× plus
poorer lz4 on the wider replica-shifted key space" (SCALE.md). This
probe measures it: the same query at both scales with
``spark.shuffle.compress=false``, so the recorded shuffle write bytes
are the raw row payload. If the uncompressed ratio is ~2×, the excess
in the compressed ratio (2.87×) is codec efficiency; if uncompressed
also grows ~2.9×, the payload itself is superlinear and the SCALE.md
sentence is wrong.

Each (scale, compress) cell runs in a fresh subprocess session.

  python scripts/latest_shuffle_attrib_probe.py [sf100_dir] [sf200_dir]
                                                [out]
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
sf_dir, compress, out_path = sys.argv[2], sys.argv[3], sys.argv[4]

from pywrangler_spark.session import get_spark
from pywrangler_spark.queries.temporal import latest_event_per_user

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark("latest-attrib-probe", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus),
                  extra_conf={"spark.driver.memory": "48g",
                              "spark.ui.enabled": "true",
                              "spark.shuffle.compress": compress,
                              "spark.shuffle.spill.compress": compress})
spark.sparkContext.setLogLevel("ERROR")
import bench
read_stages = bench._stage_metrics_reader(spark)

t0 = time.perf_counter()
latest_event_per_user(spark, sf_dir).write.format("noop").mode(
    "overwrite").save()
elapsed = time.perf_counter() - t0
time.sleep(0.5)
snap = read_stages() if read_stages else {}
sh_w = sum(s.get("shuffleWriteBytes", 0) for s in snap.values())
spill = sum(s.get("diskBytesSpilled", 0) for s in snap.values())
with open(out_path, "w") as fh:
    json.dump({"wall_s": round(elapsed, 2),
               "shuffle_write_mb": round(sh_w / 2**20, 1),
               "spill_mb": round(spill / 2**20, 1)}, fh)
"""


def main() -> int:
    sf100 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf100"
    sf200 = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf200ev"
    out_path = (
        sys.argv[3] if len(sys.argv) > 3 else "latest_shuffle_attrib.json"
    )
    cells: dict[str, dict] = {}
    with tempfile.TemporaryDirectory() as td:
        runner = os.path.join(td, "runner.py")
        with open(runner, "w") as fh:
            fh.write(_RUNNER)
        for label, sf_dir in (("sf100", sf100), ("sf200", sf200)):
            for compress in ("true", "false"):
                out = os.path.join(td, "out.json")
                if os.path.exists(out):
                    os.unlink(out)
                proc = subprocess.run(
                    [sys.executable, runner, REPO, sf_dir, compress, out],
                    stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
                    text=True,
                )
                if not os.path.exists(out):
                    print(proc.stderr[-1500:], file=sys.stderr)
                    return 1
                with open(out) as fh:
                    r = json.load(fh)
                cells[f"{label}_compress_{compress}"] = r
                print(f"{label} compress={compress}: {r}", file=sys.stderr)

    comp_ratio = round(
        cells["sf200_compress_true"]["shuffle_write_mb"]
        / cells["sf100_compress_true"]["shuffle_write_mb"], 3
    )
    raw_ratio = round(
        cells["sf200_compress_false"]["shuffle_write_mb"]
        / cells["sf100_compress_false"]["shuffle_write_mb"], 3
    )
    summary = {
        "sf100_dir": sf100,
        "sf200_dir": sf200,
        "cells": cells,
        "compressed_growth_ratio": comp_ratio,
        "uncompressed_growth_ratio": raw_ratio,
        "codec_share_of_growth": round(comp_ratio / raw_ratio, 3),
    }
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
