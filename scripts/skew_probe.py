"""Measure the hot/cold gram-split's value under planted skew.

SCALE.md argues AQE's OptimizeSkewedJoin cannot fire on the
duplicated-gram join (aggregation between exchange and join), so
``mask_duplicate_spans`` splits the join itself: grams in
``hot_min_docs``+ documents broadcast and probe map-side. This script
turns that argument into a number: plant one boilerplate header in 30%
of a corpus, run the operator with the split disabled (hot threshold
above every gram's doc count → all grams take the shuffled join) and
enabled (boilerplate grams broadcast), and report wall times plus an
output-equality check.

Usage: python scripts/skew_probe.py [--sf-dir .scratch/sf1]
       [--boiler-frac-mod 10 --boiler-frac-lt 3] [--reps 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pywrangler_spark.operators.spandedup import mask_duplicate_spans
from pywrangler_spark.session import get_spark
from pywrangler_spark.sources import read_parquet

BOILER = (
    "this document is provided under the standard license terms see "
    "the website for details all rights reserved"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=".scratch/sf1")
    ap.add_argument("--boiler-frac-mod", type=int, default=10)
    ap.add_argument("--boiler-frac-lt", type=int, default=3)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "skew_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = read_parquet(
        spark, os.path.join(args.sf_dir, "documents.parquet")
    ).select(
        "doc_id",
        F.when(
            F.col("doc_id") % args.boiler_frac_mod < args.boiler_frac_lt,
            F.concat(F.lit(BOILER + " "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    docs = docs.persist()
    n = docs.count()
    n_boiler = docs.filter(
        F.col("text").startswith(BOILER)
    ).count()
    print(f"corpus: {n} docs, {n_boiler} with planted boilerplate")

    variants = {
        # hot threshold above any gram's doc count -> everything cold:
        # the boilerplate gram rows all shuffle through one key
        "split_disabled": mask_duplicate_spans(
            n=5, min_docs=2, hot_min_docs=10 * n
        ),
        # boilerplate grams clear the hot bar -> broadcast probe,
        # their rows never shuffle
        "split_enabled": mask_duplicate_spans(
            n=5, min_docs=2, hot_min_docs=max(2, n_boiler // 10)
        ),
    }
    times: dict = {}
    sums: dict = {}
    for name, op in variants.items():
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            agg = (
                docs.transform(op)
                .agg(
                    F.sum("n_masked").alias("s"),
                    F.count(F.lit(1)).alias("c"),
                )
                .first()
            )
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 2)
        sums[name] = (agg["s"], agg["c"])
        print(f"{name}: {times[name]} s, sum(n_masked)={agg['s']}")

    equal = sums["split_disabled"] == sums["split_enabled"]
    ratio = round(times["split_disabled"] / times["split_enabled"], 2)
    print(
        f"outputs_equal={equal} straggler_ratio="
        f"{ratio}x (disabled/enabled)"
    )


if __name__ == "__main__":
    main()
