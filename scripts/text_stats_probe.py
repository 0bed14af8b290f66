#!/usr/bin/env python
"""Isolated optimization probe for text_stats (the r8 decade-table max,
7.85x — twice adjudicated as a scan-side CPU floor, never probed).

Hypotheses, each a drop-in expression with IDENTICAL semantics to the
served column (the oracle pins them):

- v1 ``tokens_count``: ``size(split(norm, ' '))`` builds a full token
  ARRAY per row just to take its length. Counting the single-space
  matches in the collapsed text (``regexp_count(norm, ' ') + 1``) gives
  the same number with no array allocation.
- v2 ``alpha_count``: ``length(regexp_replace(text, '[^A-Za-z]', ''))``
  materializes the filtered STRING per row; ``regexp_count(text,
  '[A-Za-z]')`` counts without building it.
- v3: both.

Method: same session, each variant run as a full-column aggregate
(sum of hashes — forces every column, returns one row) over the sf_dir
documents, N reps each, interleaved so a host stall cannot favor one
variant. Prints a JSON line per variant.

  python scripts/text_stats_probe.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from pywrangler_spark.functions.text import (
        BPE_PATTERN,
        normalize_text,
    )
    from pywrangler_spark.session import get_spark
    from pywrangler_spark.sources import read_parquet

    spark = get_spark(
        "text_stats_probe",
        extra_conf={"spark.driver.memory": "48g"},
    )
    docs = read_parquet(
        spark, os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")

    t = F.col("text")
    norm = normalize_text(t)

    tokens_split = F.when(norm == "", F.lit(0)).otherwise(
        F.size(F.split(norm, " "))
    ).cast("long")
    tokens_count = F.when(norm == "", F.lit(0)).otherwise(
        F.regexp_count(norm, F.lit(" ")) + 1
    ).cast("long")
    alpha_replace = (
        F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
        * 1.0 / F.nullif(F.length(t), F.lit(0))
    )
    alpha_count = (
        F.regexp_count(t, F.lit("[A-Za-z]"))
        * 1.0 / F.nullif(F.length(t), F.lit(0))
    )
    bpe = F.regexp_count(t, F.lit(BPE_PATTERN)).cast("long")
    fp = F.md5(norm)

    def variant(n_tokens, alpha):
        return docs.select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            bpe.alias("n_tokens_bpe"),
            alpha.alias("alpha_ratio"),
            fp.alias("fingerprint"),
        )

    variants = {
        "v0_current": variant(tokens_split, alpha_replace),
        "v1_token_count": variant(tokens_count, alpha_replace),
        "v2_alpha_count": variant(tokens_split, alpha_count),
        "v3_both": variant(tokens_count, alpha_count),
    }

    # equivalence first: every variant must agree with v0 exactly
    base = variants["v0_current"]
    agg = [
        F.bit_xor(F.xxhash64("doc_id", "n_tokens", "n_tokens_bpe",
                             F.round("alpha_ratio", 9), "fingerprint")
                  ).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ]
    ref = base.agg(*agg).collect()[0]
    for name, df in variants.items():
        row = df.agg(*agg).collect()[0]
        assert (row.h, row.n) == (ref.h, ref.n), (
            f"{name} diverges from v0: {row} vs {ref}"
        )
    print(f"equivalence: all variants match v0 over {ref.n} rows",
          file=sys.stderr)

    timings = {name: [] for name in variants}
    for rep in range(reps):
        for name, df in variants.items():  # interleaved
            t0 = time.monotonic()
            df.agg(*agg).collect()
            timings[name].append(round(time.monotonic() - t0, 3))
    out = {
        "sf_dir": sf_dir,
        "reps": timings,
        "min": {k: min(v) for k, v in timings.items()},
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
