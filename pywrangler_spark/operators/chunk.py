"""Document chunking — split long texts into fixed-size overlapping
windows with character offsets.

The standard pre-tokenization step of a training-data pipeline (context
windows, embedding inputs). Pure JVM expressions: ``F.sequence`` builds
the start-offset array scan-side, ``explode`` fans out one row per
chunk, ``substring`` slices — no Python in the hot path, no shuffle at
all (chunking is embarrassingly row-parallel; output partitioning
follows the scan).

At 100 TB the operative concern is row-size amplification: with
``chunk_size=2048, overlap=256`` each byte of input appears ~1.14x in
the output; the explode happens inside the scan stage, so downstream
stages see already-chunked rows and ``maxPartitionBytes`` keeps task
sizes bounded.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    id_column: str,
    text_column: str,
    chunk_size: int = 2048,
    overlap: int = 0,
    chunk_column: str = "chunk",
    index_column: str = "chunk_index",
    offset_column: str = "chunk_start",
) -> Callable[[DataFrame], DataFrame]:
    """One output row per (doc, window): ``(id, chunk_index, chunk_start,
    chunk)``. Windows start every ``chunk_size - overlap`` characters
    (1-based offsets, matching ``substring``); the final window may be
    shorter. Empty/NULL texts produce zero rows.

    ``df.transform(chunk_documents("doc_id", "text", 512, 64))``
    """
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    if not 0 <= overlap < chunk_size:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_size")
    step = chunk_size - overlap

    def _transform(df: DataFrame) -> DataFrame:
        text = F.col(text_column)
        starts = F.sequence(
            F.lit(1), F.greatest(F.length(text), F.lit(1)), F.lit(step)
        )
        exploded = df.filter(
            text.isNotNull() & (F.length(text) > 0)
        ).select(
            id_column,
            text.alias("_t"),
            F.posexplode(starts).alias(index_column, offset_column),
        )
        return exploded.select(
            id_column,
            index_column,
            offset_column,
            F.substring(
                F.col("_t"), F.col(offset_column), chunk_size
            ).alias(chunk_column),
        )

    return _transform
