"""Streaming unigram LM quality scoring — the incremental analog of
``operators.lmscore.unigram_logprob_score``.

Same fit-once/score-many split as the batch operator, same deployment
shape as ``streaming.decontaminate``: the capped unigram model is fitted
in BATCH (``operators.lmscore.fit_unigram_model``) over a reference
corpus, collected once (it is vocab_size rows by construction) and
shipped to executors as a broadcast variable. Each micro-batch row is
then scored by an Arrow-batched pandas UDF — zero state, append mode,
no watermark.

A per-doc groupBy (the batch plan's only exchange) would be STATEFUL on
a stream; the per-row UDF trades that for a Python tokenize + dict
probe, vectorized by Arrow batching. Token semantics are pinned to the
batch engine by the shared normalize/split twin
(``pandas_engine._normalize_py``), so stream and batch scores agree
row-for-row (equivalence-tested in ``tests/test_streaming.py``).
"""

from __future__ import annotations

import math
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def stream_lm_score(
    model: DataFrame,
    text_column: str = "text",
    oov_p: float = 1e-9,
    score_column: str = "lm_score",
) -> Callable[[DataFrame], DataFrame]:
    """Append ``score_column`` = mean over tokens of ``-ln p(token)`` to
    a streaming DataFrame.

    ``model`` must be a BATCH DataFrame with (term, p) columns — the
    output of ``fit_unigram_model`` — and is collected and broadcast at
    plan-build time. OOV tokens score at the constant floor ``oov_p``;
    empty/NULL documents score NULL (matching the batch operator).
    """
    if not 0.0 < oov_p < 1.0:
        raise ValueError(f"oov_p must be in (0, 1), got {oov_p}")
    if model.isStreaming:
        raise ValueError("model must be a static (batch) DataFrame")

    probs = {
        r["term"]: float(r["p"])
        for r in model.select("term", "p").collect()
    }
    bc = model.sparkSession.sparkContext.broadcast(probs)
    floor_nll = -math.log(float(oov_p))

    from pywrangler_spark.pandas_engine import _normalize_py

    @pandas_udf("double")
    def _score(texts: pd.Series) -> pd.Series:
        table = bc.value

        def one(t):
            if t is None or (isinstance(t, float) and pd.isna(t)):
                return None
            toks = [w for w in _normalize_py(t).split(" ") if w != ""]
            if not toks:
                return None
            total = 0.0
            for w in toks:
                p = table.get(w)
                total += floor_nll if p is None else -math.log(p)
            return total / len(toks)

        return pd.Series([one(t) for t in texts], dtype="float64")

    def _transform(sdf: DataFrame) -> DataFrame:
        return sdf.select(
            "*", _score(F.col(text_column)).alias(score_column)
        )

    _transform.__name__ = "stream_lm_score"
    return _transform
