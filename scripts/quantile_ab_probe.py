#!/usr/bin/env python
"""Paired A/B for the group_quantiles single-pass multi-column form.

Loads the baseline (per-column) implementation from a git ref into a
shadow module and times both forms of `quantiles_prices` in ONE session
with alternating reps (noop sink), so host drift cannot bias an arm.

Usage: python scripts/quantile_ab_probe.py [reps=4] [--ref REF]
Writes quantile_ab_probe.json (NOT the committed r12 artifact: that file
records the round-12 measurement of a then-uncommitted candidate; this
script must not silently overwrite it with a self-comparison).

The r12 round measured the candidate in the working tree against
``--ref HEAD``; at any later commit both arms are identical code unless
``--ref`` points at a commit that actually differs — the script warns
when the two sources match.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pywrangler_spark.session import get_spark  # noqa: E402


def load_old_module(ref: str) -> object:
    src = subprocess.run(
        ["git", "-C", REPO, "show",
         f"{ref}:pywrangler_spark/operators/quantile.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    cur_path = os.path.join(
        REPO, "pywrangler_spark", "operators", "quantile.py"
    )
    with open(cur_path) as fh:
        if fh.read() == src:
            print(
                f"WARNING: {ref}:operators/quantile.py is identical to the "
                "working tree — the A/B compares the same code against "
                "itself (ratio ~1.0). Pass --ref <baseline commit>.",
                file=sys.stderr,
            )
    path = "/tmp/_old_quantile_probe.py"
    with open(path, "w") as fh:
        fh.write(src)
    spec = importlib.util.spec_from_file_location("_old_quantile_probe", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    argv = list(sys.argv[1:])
    ref = "HEAD"
    if "--ref" in argv:
        i = argv.index("--ref")
        ref = argv[i + 1]
        del argv[i:i + 2]
    reps = int(argv[0]) if argv else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "quantile-ab", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import pywrangler_spark.operators.quantile as new_mod

    old_mod = load_old_module(ref)
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))

    def build(mod):
        return li.transform(
            mod.group_quantiles(
                ["l_extendedprice", "l_quantity"],
                [[0.5, 0.9], [0.5]],
                "l_returnflag",
                output_columns=[["p50_price", "p90_price"], ["p50_qty"]],
                round_digits=4,
            )
        )

    # equivalence check first: identical sorted rows
    got_new = sorted(map(tuple, build(new_mod).collect()))
    got_old = sorted(map(tuple, build(old_mod).collect()))
    assert got_new == got_old, (got_new, got_old)

    times = {"old_per_column": [], "new_single_pass": []}
    for r in range(reps):
        for name, mod in (("old_per_column", old_mod),
                          ("new_single_pass", new_mod)):
            spark.sparkContext.setJobDescription(f"quantile-ab {name} r{r}")
            df = build(mod)
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            times[name].append(round(time.monotonic() - t0, 3))
    spark.sparkContext.setJobDescription(None)

    out = {
        "metric": "quantile_multi_column_ab",
        "ref": ref,
        "sf_dir": sf_dir,
        "reps": times,
        "min_old": min(times["old_per_column"]),
        "min_new": min(times["new_single_pass"]),
        "ratio_new_over_old": round(
            min(times["new_single_pass"]) / min(times["old_per_column"]), 3
        ),
        "values_identical": True,
    }
    with open(os.path.join(REPO, "quantile_ab_probe.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
