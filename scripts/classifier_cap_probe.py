#!/usr/bin/env python
"""Holdout-equivalence probe for the classifier fit cap (max_fit_rows).

The quality-gate classifier fits on the full even-doc_id half of the
corpus each call — every L-BFGS iteration is a treeAggregate over that
input, so the fit cost grows linearly with corpus scale while the
learned model stops changing. This probe runs the EXACT gate pipeline
(LM teacher labels, median split, unigram features, 10 iterations) at a
given sf_dir with a ladder of max_fit_rows caps, reporting holdout
accuracy and wall time per cap — the measured-equivalence evidence the
cap is gated on, same methodology as the max_iter cap (SCALE.md).

  python scripts/classifier_cap_probe.py [sf_dir] [cap[:n_features]...]

Each ladder entry is a cap, optionally with a feature width (the
round-9 schedule grows both together — suggest_fit_params).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    caps = [
        (int(c.split(":")[0]),
         int(c.split(":")[1]) if ":" in c else 1 << 16)
        for c in sys.argv[2:]
    ] or [(0, 1 << 16), (2000, 1 << 16), (8000, 1 << 16),
          (32000, 1 << 16)]

    from pyspark.sql import functions as F

    from pywrangler_spark.operators.classifier import (
        fit_text_classifier,
        score_text_classifier,
    )
    from pywrangler_spark.operators.lmscore import (
        fit_unigram_model,
        unigram_logprob_score,
    )
    from pywrangler_spark.session import get_spark
    from pywrangler_spark.sources import read_parquet

    spark = get_spark(
        "classifier_cap_probe",
        extra_conf={"spark.driver.memory": "48g"},
    )
    docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
    lm = docs.transform(fit_unigram_model("text", vocab_size=20))
    scored = docs.transform(unigram_logprob_score(lm, oov_p=1e-9))
    med_df = scored.agg(F.expr("percentile(lm_score, 0.5D)").alias("_med"))
    labeled = (
        scored.crossJoin(F.broadcast(med_df))
        .withColumn(
            "qlabel",
            F.when(F.col("lm_score") <= F.col("_med"), "keep").otherwise(
                "drop"
            ),
        )
        .drop("_med")
    )
    # materialize labels once so per-cap timings measure the FIT, not
    # the shared teacher pipeline
    labeled = labeled.select("doc_id", "text", "qlabel").persist()
    n_train = labeled.filter(F.col("doc_id") % 2 == 0).count()
    train = labeled.filter(F.col("doc_id") % 2 == 0)
    test = labeled.filter(F.col("doc_id") % 2 == 1)

    results = []
    for cap, n_feat in caps:
        t0 = time.monotonic()
        model, labels = fit_text_classifier(
            train, "qlabel", n_features=n_feat, bigrams=False,
            max_iter=10, max_fit_rows=cap,
        )
        fit_s = time.monotonic() - t0
        t0 = time.monotonic()
        acc = (
            test.transform(
                score_text_classifier(
                    model, labels, n_features=n_feat, bigrams=False
                )
            )
            .agg(
                F.avg(
                    (F.col("predicted_label") == F.col("qlabel")).cast(
                        "double"
                    )
                )
            )
            .first()[0]
        )
        row = {
            "cap": cap,
            "n_features": n_feat,
            "fit_rows": min(cap, n_train) if cap else n_train,
            "holdout_acc": round(acc, 4),
            "fit_sec": round(fit_s, 2),
            "score_sec": round(time.monotonic() - t0, 2),
        }
        results.append(row)
        print(json.dumps(row), file=sys.stderr)

    out = {"sf_dir": sf_dir, "n_train": n_train, "results": results}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
