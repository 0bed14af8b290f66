#!/usr/bin/env python
"""Microbenchmark: interpreted higher-order dot() vs an unrolled
static-dim dot expression on the quadratic all-pairs cosine tier.

Hypothesis (guide §4.1 "prefer built-ins"/§1.2 per-task work): zip_with +
aggregate are CodegenFallback in Spark — every one of the ~2M pair rows
of the capped quadratic tier evaluates a per-element lambda interpreted,
allocating a zipped array per pair. An unrolled a[0]*b[0] + ... +
a[d-1]*b[d-1] chain is whole-stage-codegen'd and keeps the SAME f64
op order (left-assoc adds == index-ordered fold; the only divergence is
the +0.0/-0.0 start-value edge, which can only surface when every
product is -0.0, i.e. cosine == +-0.0 — below any threshold used).

Equivalence is gated before timing: both forms' full collected outputs
must be identical (ids AND rounded cosines).

Usage: python scripts/pairdot_probe.py [n_vectors] [dim] [reps]
Writes pairdot_probe.json in the repo root (override: PAIRDOT_OUT).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pywrangler_spark.functions.vectors import dot, l2_norm  # noqa: E402
from pywrangler_spark.session import get_spark  # noqa: E402


def unrolled_dot(a, b, dim: int):
    expr = a[0] * b[0]
    for i in range(1, dim):
        expr = expr + a[i] * b[i]
    return expr


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("pairdot-probe")

    rng = np.random.RandomState(7)
    mat = rng.standard_normal((n, dim)).round(4)
    rows = [(i, [float(x) for x in mat[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "id: long, v: array<double>")
    base = df.select(
        F.col("id").alias("_id"),
        F.col("v").alias("_bv"),
        l2_norm(F.col("v")).alias("_bn"),
    ).persist()
    base.count()

    def pairs(dot_fn):
        a = base.select(F.col("_id").alias("id_a"),
                        F.col("_bv").alias("_va"), F.col("_bn").alias("_na"))
        b = base.select(F.col("_id").alias("id_b"),
                        F.col("_bv").alias("_vb"), F.col("_bn").alias("_nb"))
        return (
            a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a", "id_b",
                F.round(
                    dot_fn(F.col("_va"), F.col("_vb"))
                    / F.nullif(F.col("_na") * F.col("_nb"), F.lit(0.0)),
                    6,
                ).alias("cosine"),
            )
            .filter(F.col("cosine") >= 0.3)
        )

    hof = pairs(lambda a, b: dot(a, b))
    unr = pairs(lambda a, b: unrolled_dot(a, b, dim))

    # equivalence gate BEFORE timing
    got_h = sorted(map(tuple, hof.collect()))
    got_u = sorted(map(tuple, unr.collect()))
    assert got_h == got_u, (
        f"outputs differ: {len(got_h)} vs {len(got_u)} rows"
    )
    print(f"equivalence gate: {len(got_h)} identical pairs", file=sys.stderr)

    out = {"n": n, "dim": dim, "n_pairs_out": len(got_h),
           "hof_reps": [], "unrolled_reps": []}
    for r in range(reps):
        for name, frame, key in (("hof", hof, "hof_reps"),
                                 ("unrolled", unr, "unrolled_reps")):
            t0 = time.time()
            frame.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            out[key].append(dt)
            print(f"rep {r} {name}: {dt}s", file=sys.stderr)
    out["hof_min"] = min(out["hof_reps"])
    out["unrolled_min"] = min(out["unrolled_reps"])
    out["ratio_unrolled_over_hof"] = round(
        out["unrolled_min"] / out["hof_min"], 3
    )
    path = os.environ.get("PAIRDOT_OUT", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "pairdot_probe.json"))
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
