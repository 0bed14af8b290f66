"""Timestamp→epoch helpers that are safe for BOTH ``TimestampType`` and
``TimestampNTZType`` inputs.

Driver/pandas-written parquet stores naive ``timestamp[us]`` columns, which
Spark (``spark.sql.parquet.inferTimestampNTZ.enabled=true``, the default)
reads as TIMESTAMP_NTZ. NTZ rejects ``cast(ts as double)`` and
``unix_micros(ts)`` with DATATYPE_MISMATCH. Casting through ``timestamp``
first is valid for both types (for NTZ the wall time is interpreted in the
session time zone, which this engine pins to UTC — see
:func:`pywrangler_spark.session.get_spark`), is a no-op for TimestampType,
and stays JVM-side/codegen'd.

Every operator that needs an epoch number MUST use these helpers instead of
raw casts, so user-supplied DataFrames that did not come through
:func:`pywrangler_spark.sources.read_parquet` still work.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def as_timestamp(c: ColumnOrName) -> Column:
    """Normalize timestamp / timestamp_ntz / date / ISO string to
    ``TimestampType`` (no-op for TimestampType)."""
    return _col(c).cast("timestamp")


def epoch_micros(c: ColumnOrName) -> Column:
    """Microseconds since the epoch as ``long``; NTZ-safe."""
    return F.unix_micros(as_timestamp(c))


def epoch_seconds(c: ColumnOrName) -> Column:
    """Seconds since the epoch as ``double`` (microsecond resolution
    preserved in the fraction); NTZ-safe replacement for
    ``ts.cast("double")``."""
    return epoch_micros(c) / F.lit(1_000_000.0)
