#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Execution is forced with a noop datasource write (full computation, no
driver-side collect), matching how a real pipeline sinks results.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pywrangler_spark.queries import QUERIES
    from pywrangler_spark.session import get_spark

    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm up the JVM / parquet footers so per-query numbers measure the
    # queries, not session bring-up
    from pywrangler_spark.sources import read_parquet

    try:
        read_parquet(spark, os.path.join(sf_dir, "lineitem.parquet")).count()
    except Exception:  # noqa: BLE001 — warm-up is best-effort only
        pass

    # best-of-N, measured across full PASSES over the suite rather than
    # back-to-back reps: host contention and GC arrive in multi-minute
    # bursts, so consecutive reps of one query share the same bad window —
    # whole-suite passes decorrelate the reps in time (like the
    # reference's timeit-based profiler, but burst-robust)
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    timings: dict = {}
    errors: dict = {}
    names = sorted(QUERIES)
    for _ in range(reps):
        for name in names:
            if name in errors:
                continue  # failed once; don't burn reps on it
            # construction inside the timer: some operators (e.g. the
            # range-partitioned global interval op) run summary jobs
            # while building their plan
            t0 = time.perf_counter()
            try:
                df = QUERIES[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001 — fault isolation:
                # one broken query must never zero the whole bench artifact
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                timings.pop(name, None)
                continue
            elapsed = time.perf_counter() - t0
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed
        spark.sparkContext._jvm.System.gc()
    timings = {k: round(v, 3) for k, v in timings.items()}

    sf_match = re.search(r"sf([0-9.]+)", sf_dir)
    result = {
        "metric": "total_query_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf_match.group(1)) if sf_match else None,
    }
    if errors:
        result["errors"] = errors
    print(json.dumps(result))


if __name__ == "__main__":
    main()
