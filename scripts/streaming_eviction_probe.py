#!/usr/bin/env python
"""Sustained-rate probe #2: eviction-driven streaming state.

The r11 neardup probe proved membership-keyed dedup state (corpus-
linear buckets, duplicates add zero rows). This probe covers the OTHER
state shape — `stream_resample_locf`, whose state is one row per key
(LOCF carry + the open bucket's partial) and is REPLACED on every
bucket close — under sustained load: offered rate must hold, state
rows must plateau at exactly the key count, and state bytes must stay
flat while emitted rows keep growing (closed buckets leaving state).

Input: the rate source's own event-time, keyed ``value % n_keys``, so
every key receives events continuously and closes a bucket every
``step_seconds`` of wall time.

  python scripts/streaming_eviction_probe.py [rows_per_sec] [seconds]
                                             [n_keys] [step_s] [out]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    rate = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    seconds = int(sys.argv[2]) if len(sys.argv) > 2 else 90
    n_keys = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    step_s = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    out_path = (
        sys.argv[5] if len(sys.argv) > 5 else "streaming_eviction_probe.json"
    )

    from pyspark.sql import functions as F

    from pywrangler_spark.session import get_spark
    from pywrangler_spark.streaming.resample import stream_resample_locf

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "streaming-eviction-probe", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rate)
        .option("numPartitions", 8)
        .load()
        .select(
            (F.col("value") % n_keys).alias("user_id"),
            F.col("timestamp").alias("ts"),
            (F.col("value") % 97).cast("double").alias("value"),
        )
    )
    out = src.transform(
        stream_resample_locf("ts", step_s, "user_id", "value", agg="avg")
    )
    ckpt = os.path.join(REPO, ".scratch", "stream_evict_ckpt")
    q = (
        out.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    t0 = time.time()
    samples = []
    seen_batches = set()
    try:
        while time.time() - t0 < seconds:
            time.sleep(2)
            for p in q.recentProgress:
                bid = p["batchId"]
                if bid in seen_batches or not p.get("stateOperators"):
                    continue
                seen_batches.add(bid)
                s = p["stateOperators"][0]
                samples.append({
                    "t_s": round(time.time() - t0, 1),
                    "batch": bid,
                    "input_rps": round(p.get("inputRowsPerSecond") or 0, 1),
                    "proc_rps": round(
                        p.get("processedRowsPerSecond") or 0, 1),
                    "batch_rows": p.get("numInputRows"),
                    "out_rows": (p.get("sink") or {}).get("numOutputRows"),
                    "state_rows": s.get("numRowsTotal"),
                    "state_updated": s.get("numRowsUpdated"),
                    "state_mb": round(
                        (s.get("stateMemory")
                         or s.get("memoryUsedBytes") or 0) / 2**20, 2),
                    "batch_ms": (p.get("durationMs") or {}).get(
                        "triggerExecution"),
                })
    finally:
        q.stop()
        spark.stop()

    samples.sort(key=lambda r: r["batch"])
    steady = samples[len(samples) // 2:]
    sustained = (
        sum(s["proc_rps"] for s in steady) / len(steady) if steady else 0
    )
    # state flatness over the steady half: rows must pin at n_keys,
    # bytes must not trend up while output keeps flowing
    state_rows_steady = sorted({s["state_rows"] for s in steady})
    mb_first = steady[0]["state_mb"] if steady else None
    mb_last = steady[-1]["state_mb"] if steady else None
    out_flowing = sum(
        1 for s in steady if (s["out_rows"] or 0) > 0
    )
    result = {
        "rows_per_sec_offered": rate,
        "run_seconds": seconds,
        "n_keys": n_keys,
        "step_seconds": step_s,
        "n_batches": len(samples),
        "total_rows": sum(s["batch_rows"] or 0 for s in samples),
        "sustained_proc_rps_steady_half": round(sustained, 1),
        "state_rows_steady_distinct": state_rows_steady,
        "state_mb_steady_first": mb_first,
        "state_mb_steady_last": mb_last,
        "steady_batches_emitting": out_flowing,
        "steady_batches_total": len(steady),
        "final_state_rows": samples[-1]["state_rows"] if samples else None,
        "samples": samples,
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    compact = {k: v for k, v in result.items() if k != "samples"}
    print(json.dumps(compact))
    return 0


if __name__ == "__main__":
    sys.exit(main())
