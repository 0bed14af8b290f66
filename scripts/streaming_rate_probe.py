#!/usr/bin/env python
"""Sustained-rate state-size probe for the highest-state streaming twin.

The 18 streaming twins have streamed-vs-batch equivalence tests but no
sustained-input evidence that their bounded-state designs hold under
load (r10 verdict ask #6). This drives `stream_neardup_minhash` — the
highest-state twin: band-bucket state keeps (id, signature) per member
— from a rate-limited source for a bounded wall-clock run and records,
per micro-batch, the state store's row count and bytes plus input vs
processed rates, straight from the StreamingQuery progress feed.

Synthetic input: each rate-source row becomes a document; a `dup_frac`
fraction repeats one of `n_templates` boilerplate texts verbatim (the
duplication the operator exists to catch — exercises pair emission and
the max_bucket_size hot-bucket cap), the rest are distinct texts
derived from the row value. State growth therefore has two regimes:
template buckets hit the cap and FREEZE (bounded hot state); distinct
docs keep adding one member to ~`bands` buckets each (corpus-linear
membership — the documented whole-corpus contract, same as batch
signatures; the claim under test is that per-bucket state is capped
and throughput holds at the offered rate, not that total state is
finite under unbounded distinct input).

  python scripts/streaming_rate_probe.py [rows_per_sec] [seconds] [out]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    rate = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    seconds = int(sys.argv[2]) if len(sys.argv) > 2 else 90
    out_path = (
        sys.argv[3] if len(sys.argv) > 3 else "streaming_rate_probe.json"
    )

    from pyspark.sql import functions as F

    from pywrangler_spark.session import get_spark
    from pywrangler_spark.streaming.neardup import stream_neardup_minhash

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "streaming-rate-probe", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_templates = 64
    dup_frac = 0.25  # 1 in 4 rows is a verbatim boilerplate copy
    mod = int(1 / dup_frac * n_templates)

    # deterministic text per row value: templates repeat verbatim,
    # distinct docs vary every shingle via the value
    v = F.col("value")
    is_dup = (v % mod) < n_templates
    template = F.concat(
        F.lit("boilerplate header "),
        *[
            F.concat(F.lit(f"t{j} tpl"), (v % n_templates).cast("string"),
                     F.lit(" "))
            for j in range(12)
        ],
    )
    distinct = F.concat(
        *[
            F.concat(F.lit(f"w{j} u"), ((v * (j + 3)) % 999_983).cast(
                "string"), F.lit(" "))
            for j in range(12)
        ]
    )
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rate)
        .option("numPartitions", 8)
        .load()
        .select(
            F.col("value").alias("doc_id"),
            F.when(is_dup, template).otherwise(distinct).alias("text"),
        )
    )
    pairs = src.transform(stream_neardup_minhash("doc_id", "text"))
    q = (
        pairs.writeStream.format("noop")
        .option("checkpointLocation",
                os.path.join(REPO, ".scratch", "stream_probe_ckpt"))
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
                    "state_rows": s.get("numRowsTotal"),
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
    # throughput verdict: offered vs sustained over the steady half
    steady = samples[len(samples) // 2:]
    sustained = (
        sum(s["proc_rps"] for s in steady) / len(steady) if steady else 0
    )
    result = {
        "rows_per_sec_offered": rate,
        "run_seconds": seconds,
        "n_batches": len(samples),
        "total_rows": sum(s["batch_rows"] or 0 for s in samples),
        "sustained_proc_rps_steady_half": round(sustained, 1),
        "final_state_rows": samples[-1]["state_rows"] if samples else None,
        "final_state_mb": samples[-1]["state_mb"] if samples else None,
        "samples": samples,
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    compact = {k: v for k, v in result.items() if k != "samples"}
    print(json.dumps(compact))
    return 0


if __name__ == "__main__":
    sys.exit(main())
