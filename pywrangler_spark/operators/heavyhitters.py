"""Approximate heavy hitters (frequent terms) — sample-candidates +
exact-verify, the two-pass shape that scales.

An exact global term count over 100 TB of text shuffles the full
exploded token stream (~20x the corpus bytes). The standard scale
pattern is:

1. **Candidate generation** on a deterministic hash-sample of the
   documents (md5-bucketed, never ``rand()``): count terms on ~f of the
   corpus, keep the top ``k * slack`` candidates. Heavy hitters with
   frequency >> 1/(f*N) appear in any uniform sample with overwhelming
   probability; the slack factor absorbs sampling noise near the
   boundary.
2. **Exact verification**: count ONLY the candidate terms over the full
   corpus via a broadcast semi-join — the shuffle now carries one
   (term, partial-count) row per task per candidate instead of the
   whole token stream (map-side partial aggregation does the rest).

The result is exact counts for every returned term; the approximation
risk is bounded to *membership* near the k-th rank, which the recall
column of the driver query surfaces deterministically.

Reference parity: the reference has no frequency-sketch operators; this
fills the vocabulary/heavy-hitter slot of a corpus pipeline (cf.
sample-and-verify frequent-item mining, public literature: Manku &
Motwani lossy counting; MG/space-saving summaries).
"""

from __future__ import annotations

from typing import Callable, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pywrangler_spark.functions.text import words
from pywrangler_spark.operators.sampling import _BUCKETS, _bucket


def top_terms_sampled(
    text_column: str,
    id_column: str,
    k: int,
    sample_fraction: float = 0.2,
    slack: int = 3,
    seed: Union[int, str] = 42,
) -> Callable[[DataFrame], DataFrame]:
    """Top-``k`` terms by exact corpus frequency, discovered on a
    hash-sample and exact-counted on the full corpus.

    Returns ``(term, n_exact)`` sorted by ``n_exact`` desc, ``term``
    asc (a total order — ties cannot reorder across engines). Terms the
    sample missed are absent; at sane fractions that only affects terms
    tied near rank k.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0.0 < sample_fraction <= 1.0:
        raise ValueError(
            f"sample_fraction must be in (0, 1], got {sample_fraction}"
        )
    if slack < 1:
        raise ValueError(f"slack must be >= 1, got {slack}")

    def _transform(df: DataFrame) -> DataFrame:
        tokens = df.select(
            _bucket(id_column, seed).alias("_b"),
            F.explode(words(F.col(text_column))).alias("term"),
        ).filter(F.col("term") != "")
        candidates = (
            tokens.filter(F.col("_b") < int(round(sample_fraction * _BUCKETS)))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("_n_sample"))
            .orderBy(F.col("_n_sample").desc(), F.col("term").asc())
            .limit(k * slack)
            .select("term")
        )
        exact = (
            tokens.join(F.broadcast(candidates), "term", "left_semi")
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("n_exact"))
        )
        return exact.orderBy(
            F.col("n_exact").desc(), F.col("term").asc()
        ).limit(k)

    _transform.__name__ = "top_terms_sampled"
    return _transform
