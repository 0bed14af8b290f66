"""Exactly-once parquet sink for Structured Streaming via idempotent
``foreachBatch`` writes.

Spark's streaming file sink is already exactly-once *on its own log*,
but pipelines that post-process output with other engines (DuckDB
oracles, downstream Spark batch jobs, external loaders) want plain
hive-partitioned parquet with no `_spark_metadata` dependency. The
standard recipe is ``foreachBatch`` + an idempotent writer keyed by
``batchId``:

- each micro-batch lands in ``<path>/batch_id=<n>/`` — written to a
  scratch dir first, then atomically renamed into place;
- on restart/replay (checkpoint recovery re-delivers the last batch),
  the writer sees the committed ``batch_id=<n>`` directory and SKIPS the
  rewrite — at-least-once delivery becomes exactly-once output;
- readers load ``spark.read.parquet(path)`` and see ``batch_id`` as an
  ordinary partition column (pruning works).

State lives entirely in the filesystem layout — no side database. The
rename-commit assumes a filesystem with atomic directory rename (local,
HDFS); on object stores, point the sink at a committer-backed path.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable, Optional

from pyspark.sql import DataFrame


def idempotent_parquet_sink(
    path: str,
    mode: str = "append",
    coalesce: Optional[int] = None,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function:
    ``stream.writeStream.foreachBatch(idempotent_parquet_sink(p))``.

    Replayed batch ids are skipped (exactly-once output); a crash
    mid-write leaves only a scratch dir (``_tmp_batch_id=<n>``), which
    the next attempt clears before rewriting.
    """
    if mode != "append":
        raise ValueError(
            f"only append mode is meaningful per-batch, got {mode!r}"
        )

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        final = os.path.join(path, f"batch_id={batch_id}")
        if os.path.isdir(final):  # replayed batch — already committed
            return
        scratch = os.path.join(path, f"_tmp_batch_id={batch_id}")
        if os.path.isdir(scratch):  # crashed previous attempt
            shutil.rmtree(scratch)
        out = batch_df if coalesce is None else batch_df.coalesce(coalesce)
        out.write.mode("overwrite").parquet(scratch)
        os.replace(scratch, final)  # atomic commit

    return _write
