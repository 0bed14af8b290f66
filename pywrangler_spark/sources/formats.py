"""CSV / JSON readers and generic writers.

The reference has no file-format scanners (data enters from in-memory
objects); these complete the source/sink surface for real deployments.
Readers take an explicit schema by default — schema inference requires
an extra full pass over the data, which is wasteful at scale and
non-deterministic under sampling.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_SchemaLike = Union[str, T.StructType, None]


def read_csv(
    spark: SparkSession,
    path: str,
    schema: _SchemaLike = None,
    header: bool = True,
    **options,
) -> DataFrame:
    """CSV scan. Pass a DDL string or StructType; ``schema=None`` falls
    back to inference (extra data pass — avoid at scale)."""
    reader = spark.read.option("header", str(header).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: _SchemaLike = None,
    **options,
) -> DataFrame:
    """JSON-lines scan; explicit schema strongly recommended (inference
    reads everything once before the real scan)."""
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(
    spark: SparkSession,
    path: str,
    **options,
) -> DataFrame:
    """ORC scan — columnar like parquet (schema travels with the file, so
    no explicit-schema argument needed); same pushdown/pruning behavior."""
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.orc(path)


def write_table(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    mode: str = "overwrite",
    partition_by: Optional[list] = None,
    **options,
) -> None:
    """Sink to parquet/csv/json. ``partition_by`` produces hive-style
    directory partitioning — the coarse pruning lever for downstream
    scans at scale."""
    writer = df.write.format(format).mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    if format == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    cluster_by: list,
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Write parquet range-CLUSTERED on ``cluster_by``: rows are
    range-partitioned into ``n_files`` disjoint key ranges and sorted
    within each file. Downstream scans filtering on the cluster key
    skip whole files via parquet min/max footer stats (row-group
    pruning) — the fine-grained complement to hive ``partition_by``
    (which explodes into directories and breaks down past ~10k values).
    The cost is one range-partition shuffle at write time, paid once.
    """
    (
        df.repartitionByRange(n_files, *cluster_by)
        .sortWithinPartitions(*cluster_by)
        .write.mode(mode)
        .parquet(path)
    )
