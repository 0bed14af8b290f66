"""pywrangler_spark — a PySpark-native data-wrangling & analytics engine.

A from-scratch rebuild of the capabilities of mansenfranzen/pywrangler
(reference surveyed in SURVEY.md), designed Spark-first: every operator is
declared through the DataFrame / Spark SQL API so Catalyst + Tungsten pick
the physical strategy; Python UDFs are reserved for semantics the built-in
functions genuinely cannot express (and then always Arrow-batched).

Subpackages
-----------
operators   relational / window operators (interval identification,
            sessionization, dedup, similarity search, text analysis)
sources     readers/writers for the supported formats (parquet/csv/json)
            plus in-memory literal frames
functions   column-level function library (hashing, text metrics, vectors)
plans       plan introspection & physical-shape helpers (explain parsing,
            shuffle counting, cache control)
streaming   Structured Streaming variants of the batch operators
testing     engine-independent golden-data test kit (PlainFrame,
            DataTestCase, mutation testing)
"""

from pywrangler_spark.base import BaseWrangler, SparkWrangler
from pywrangler_spark.operators.interval_identifier import (
    IntervalIdentifier,
    identify_intervals,
)

__version__ = "0.1.0"

__all__ = [
    "BaseWrangler",
    "SparkWrangler",
    "IntervalIdentifier",
    "identify_intervals",
    "__version__",
]
