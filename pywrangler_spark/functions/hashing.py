"""Deterministic cross-engine hashing.

Spark's builtin ``hash``/``xxhash64`` (murmur3/xxhash) have no DuckDB
equivalent, so operators whose results must be reproducible outside Spark
(dedup fingerprints, minhash permutations, simhash) derive integer hashes
from **md5**, which every engine computes identically. The JVM computes md5
natively inside codegen — this is not a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash56(col: Column) -> Column:
    """56-bit integer hash (first 14 hex digits of md5) — fits in a signed
    64-bit long on every engine."""
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("long")


def hash28(col: Column) -> Column:
    """28-bit integer hash (first 7 hex digits of md5). Small enough that
    ``a * h + b`` with 31-bit multipliers stays inside int64 — the building
    block for cross-engine minhash permutations."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")
