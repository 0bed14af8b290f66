"""Streaming serving for trained models: classifier gating and ANN
cell routing.

Both trained-model serve paths in this repo are stateless scan-side
projections over broadcast artifacts — which is exactly what a
Structured Streaming micro-batch can run with zero state, append mode,
no watermark (the same deployment shape as
``streaming.lmscore.stream_lm_score``):

- the text classifier (``operators.classifier``) serves as a hashed
  featurization + one sparse dot against the broadcast coefficient
  matrix (MLlib's transform is a per-row projection; HashingTF has no
  vocabulary state);
- IVF ANN serving (``operators.similarity``) starts by assigning each
  vector to its nearest trained centroid — one small matmul per Arrow
  batch against the broadcast centroid matrix.

``stream_classify_gate`` is the pipeline use of the first: admit only
documents the trained quality classifier scores as ``keep_label`` with
at least ``min_confidence`` — the trained-filter slot of a streaming
ingest pipeline. ``stream_nearest_centroid`` is the streaming half of
the second: route incoming embeddings to their IVF cell (shard) as
they arrive, so the batch-side inverted lists stay partition-aligned.

Streamed-vs-batch equivalence for both is pinned in
``tests/test_streaming.py`` — the transforms are engine-agnostic and
run identically on batch DataFrames.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pywrangler_spark.operators.classifier import score_text_classifier


def stream_classify_gate(
    model,
    labels: Sequence[str],
    keep_label: str,
    min_confidence: float = 0.5,
    text_column: str = "text",
    n_features: int = 1 << 18,
    bigrams: bool = True,
    prediction_column: str = "predicted_label",
    confidence_column: str = "confidence",
) -> Callable[[DataFrame], DataFrame]:
    """Score each document with the fitted classifier and keep only
    rows predicted ``keep_label`` with confidence >=
    ``min_confidence``. Zero state: coefficients ride in MLlib's
    broadcast, the filter is a scan-side predicate — append mode on a
    stream, and bit-identical on a batch frame (equivalence-tested).
    Feature parameters must match the fit (same contract as
    :func:`~pywrangler_spark.operators.classifier.score_text_classifier`).
    """
    if keep_label not in labels:
        raise ValueError(
            f"keep_label {keep_label!r} not in fitted labels {list(labels)}"
        )
    if not 0.0 <= min_confidence <= 1.0:
        raise ValueError(
            f"min_confidence must be in [0, 1], got {min_confidence}"
        )
    scorer = score_text_classifier(
        model,
        labels,
        text_column=text_column,
        n_features=n_features,
        bigrams=bigrams,
        prediction_column=prediction_column,
        confidence_column=confidence_column,
    )

    def _transform(sdf: DataFrame) -> DataFrame:
        return scorer(sdf).filter(
            (F.col(prediction_column) == keep_label)
            & (F.col(confidence_column) >= min_confidence)
        )

    _transform.__name__ = "stream_classify_gate"
    return _transform


def stream_nearest_centroid(
    centroids: np.ndarray,
    vector_column: str = "embedding",
    cell_column: str = "cell",
    similarity_column: str = "cell_cosine",
) -> Callable[[DataFrame], DataFrame]:
    """Append each vector's nearest trained centroid id and its cosine
    — the routing step of IVF serving, runnable on a stream because the
    centroid matrix (kilobytes, from
    :func:`~pywrangler_spark.operators.similarity.train_ivf_centroids`)
    rides in the UDF closure and each Arrow batch costs one
    ``(batch x n_centroids)`` matmul. Ties break to the lower cell id
    (stable argsort), matching the batch assignment in
    ``operators.similarity``. NULL vectors yield NULL cell/cosine.
    """
    cents = np.asarray(centroids, dtype="float64")
    if cents.ndim != 2 or cents.shape[0] == 0:
        raise ValueError(
            f"centroids must be a (n_centroids, dim) matrix, got shape "
            f"{cents.shape}"
        )

    @pandas_udf("struct<cell: int, cos: double>")
    def _assign(vs: pd.Series) -> pd.DataFrame:
        mask = vs.notna().to_numpy()
        cells = np.full(len(vs), -1, dtype="int64")
        coss = np.full(len(vs), np.nan)
        if mask.any():
            mat = np.stack(vs[mask].to_numpy()).astype("float64")
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            sims = (mat / norms) @ cents.T
            order = np.argsort(-sims, axis=1, kind="stable")[:, 0]
            cells[mask] = order
            coss[mask] = np.round(sims[np.arange(len(sims)), order], 6)
        return pd.DataFrame(
            {
                "cell": pd.array(
                    [int(c) if c >= 0 else None for c in cells],
                    dtype="Int32",
                ),
                "cos": coss,
            }
        )

    def _transform(sdf: DataFrame) -> DataFrame:
        assigned = _assign(F.col(vector_column))
        return sdf.select(
            "*",
            assigned["cell"].alias(cell_column),
            assigned["cos"].alias(similarity_column),
        )

    _transform.__name__ = "stream_nearest_centroid"
    return _transform
