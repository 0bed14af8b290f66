"""Hashed document vectors — signed feature hashing into a dense
fixed-width embedding (Weinberger et al., "Feature Hashing for Large
Scale Multitask Learning"), entirely in md5-derived integer arithmetic
so the vectors are bit-reproducible in any engine.

This is the model-free bridge from text to the ANN ladder: every
document gets an ``array<double>`` of width ``dim`` where token ``t``
adds ``sign(t)`` at index ``hash(t) mod dim``; cosine over these
vectors approximates weighted token overlap, so the similarity
operators (near-dup pairs, top-k, IVF/PQ indexes) run on raw text with
no external embedding model.

Scale shape: the same single-aggregation trick as the SimHash sketch —
explode tokens scan-side, ONE groupBy(doc) with ``dim`` conditional
sums (codegen'd expr strings, no per-dim shuffle), assemble the array.
One exchange keyed by doc id; the shuffle carries (doc_id, 64 partial
sums), never tokens.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pywrangler_spark.functions.hashing import hash56
from pywrangler_spark.functions.text import words


def hashed_doc_vectors(
    id_column: str = "doc_id",
    text_column: str = "text",
    dim: int = 64,
    vector_column: str = "doc_vec",
) -> Callable[[DataFrame], DataFrame]:
    """(id, doc_vec array<double>): signed-hash token counts. The sign
    comes from bit 55 of the 56-bit md5 hash, the index from
    ``hash mod dim`` — both reproducible via the documented DuckDB
    arithmetic. Documents with no tokens are absent from the output
    (join back and coalesce if a full spine is needed)."""
    if not 2 <= dim <= 4096:
        raise ValueError(f"dim must be in [2, 4096], got {dim}")

    def _transform(df: DataFrame) -> DataFrame:
        from pywrangler_spark.operators.dedup import _scale_out

        toks = _scale_out(df).select(
            F.col(id_column).alias("id"),
            F.explode(words(F.col(text_column))).alias("_tok"),
        ).filter(F.col("_tok") != "").withColumn(
            "_h", hash56(F.col("_tok"))
        )
        # single-expr strings, not composed Columns (same py4j-cost
        # rationale as the simhash vote columns)
        sums = toks.groupBy("id").agg(
            *[
                F.expr(
                    f"sum(if(pmod(_h, {dim}L) = {i}L,"
                    f" if((_h & {1 << 55}L) != 0, 1.0D, -1.0D), 0.0D))"
                ).alias(f"_d{i}")
                for i in range(dim)
            ]
        )
        vec = F.array(*[F.col(f"_d{i}") for i in range(dim)])
        return sums.select("id", vec.alias(vector_column))

    _transform.__name__ = "hashed_doc_vectors"
    return _transform
