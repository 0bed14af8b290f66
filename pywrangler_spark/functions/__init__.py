"""Column-level function library (pure ``pyspark.sql.functions``
compositions — JVM-side, codegen'd, no Python UDFs)."""

from pywrangler_spark.functions.hashing import hash56, hash28
from pywrangler_spark.functions.temporal import (
    as_timestamp,
    epoch_micros,
    epoch_seconds,
)
from pywrangler_spark.functions.text import (
    bpe_token_count,
    fingerprint,
    normalize_text,
    quality_alpha_ratio,
    token_count,
    word_shingles,
    words,
)
from pywrangler_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
    to_double_array,
)

__all__ = [
    "hash56",
    "hash28",
    "as_timestamp",
    "epoch_micros",
    "epoch_seconds",
    "normalize_text",
    "fingerprint",
    "words",
    "word_shingles",
    "token_count",
    "bpe_token_count",
    "quality_alpha_ratio",
    "to_double_array",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
