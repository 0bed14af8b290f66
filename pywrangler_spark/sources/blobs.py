"""Raw-file ingestion sources: binary blobs and text shards.

The front door of a training-data pipeline is rarely parquet — it is a
bucket of media files (images/audio/video) or line-oriented text shards
(JSONL/WET dumps). These readers wrap Spark's built-in ``binaryFile``
and ``text`` data sources (both scan-parallel, both partition-pruned by
``pathGlobFilter``) and land rows directly in the shapes the rest of
the engine consumes: the ``operators.multimodal`` blob schema and the
``documents``-style text schema.

At 100 TB the operative properties:

- ``binaryFile`` reads each file as ONE row (path, modificationTime,
  length, content) and respects ``spark.sql.files.maxPartitionBytes``
  for task sizing; files larger than 2 GiB cannot be read (Spark hard
  limit — the byte array is one JVM allocation), so the reader exposes
  ``max_bytes`` as a *pushed* filter on the ``length`` column, which
  the binaryFile source evaluates from file metadata WITHOUT opening
  the file. Always bound it.
- ``text`` streams splittable line records (one task per HDFS block,
  not per file) — the right scan for WET/JSONL shards. In line mode
  rows carry no intra-file ordinal (a distributed scan has no stable
  line number without a per-file sort); identity therefore comes from
  content+path hashing, not position.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pywrangler_spark.functions.hashing import hash56


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: Optional[str] = None,
    recursive: bool = False,
    max_bytes: Optional[int] = 64 * 1024 * 1024,
) -> DataFrame:
    """One row per file: ``(blob_id, path, modification_time, n_bytes,
    blob, blob_meta)`` — the ``operators.multimodal`` column contract
    (``blob`` binary + ``blob_meta`` struct<format,n_bytes>), with a
    deterministic 56-bit ``blob_id`` derived from the file path.

    ``max_bytes`` filters on file *metadata* before any content is
    read (the binaryFile source pushes ``length`` predicates); pass
    ``None`` only when every file is known-small.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    fmt = F.lower(
        F.coalesce(
            F.nullif(F.regexp_extract(F.col("path"), r"\.([^./\\]+)$", 1), F.lit("")),
            F.lit("bin"),
        )
    )
    return df.select(
        hash56(F.col("path")).alias("blob_id"),
        F.col("path"),
        F.col("modificationTime").alias("modification_time"),
        F.col("length").alias("n_bytes"),
        F.col("content").alias("blob"),
        F.struct(
            fmt.alias("format"),
            F.col("length").cast("long").alias("n_bytes"),
        ).alias("blob_meta"),
    )


def read_text_shards(
    spark: SparkSession,
    path: str,
    glob: Optional[str] = None,
    recursive: bool = False,
    whole_files: bool = False,
    line_sep: Optional[str] = None,
) -> DataFrame:
    """Line-oriented (default) or whole-file text ingestion into the
    ``documents`` shape: ``(doc_id, text, source)``.

    - ``whole_files=False``: one row per line via the splittable
      ``text`` source — block-parallel even over few huge shards.
      ``doc_id`` hashes (source path, line content): deterministic
      across runs and cluster layouts, though verbatim-duplicate lines
      within one file collide by construction (the pipeline dedups
      those anyway). Empty lines are dropped.
    - ``whole_files=True``: one row per file (``wholetext``) —
      ``doc_id`` hashes the path alone. Not splittable; per-file
      parallelism only, same 2 GiB ceiling as ``binaryFile``.

    ``source`` carries the originating file path for per-source caps,
    mix planning, and provenance joins downstream.
    """
    reader = spark.read
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    # wholetext/lineSep go through .text()'s own kwargs: the pyspark
    # method re-sets both options from its signature defaults, so a
    # prior .option() call would be silently clobbered
    df = reader.text(path, wholetext=whole_files, lineSep=line_sep).select(
        F.col("value").alias("text"),
        F.input_file_name().alias("source"),
    )
    if not whole_files:
        df = df.filter(F.col("text") != "")
    key = (
        F.col("source")
        if whole_files
        else F.concat_ws("\n", F.col("source"), F.col("text"))
    )
    return df.select(
        hash56(key).alias("doc_id"), F.col("text"), F.col("source")
    )
