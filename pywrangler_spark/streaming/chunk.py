"""Streaming content-defined chunking — the incremental analog of
``operators.chunk.chunk_content_defined``.

CDC chunking is a purely per-document decision (a boundary depends on
a 2-token hash window inside ONE document), so the streaming twin is
STATELESS: each micro-batch's documents chunk independently, and a
document produces the same chunks whenever it arrives. That makes this
the cheapest possible streaming operator — a scan-side projection with
no state store, no watermark requirement, and append-mode output that
chains freely after (or before) stateful stages like the streaming
near-dup signatures.

The boundary rule and hash are shared with the batch operator via
``chunk_content_defined_scan_side`` (streamed-vs-batch equivalence is
pinned in tests/test_streaming.py).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from pywrangler_spark.operators.chunk import chunk_content_defined_scan_side


def stream_chunk_content_defined(
    id_column: str,
    text_column: str,
    avg_tokens: int = 16,
    chunk_column: str = "chunk",
    index_column: str = "chunk_index",
    token_offset_column: str = "token_start",
) -> Callable[[DataFrame], DataFrame]:
    """Chunk a streaming DataFrame of documents content-defined.

    Output rows: ``(id, chunk_index, token_start, chunk, n_tokens)`` —
    identical to the batch operator on the same documents.

    ``sdf.transform(stream_chunk_content_defined("doc_id", "text"))``
    """
    return chunk_content_defined_scan_side(
        id_column,
        text_column,
        avg_tokens=avg_tokens,
        chunk_column=chunk_column,
        index_column=index_column,
        token_offset_column=token_offset_column,
    )
