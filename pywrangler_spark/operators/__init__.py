"""Relational / window operators."""

from pywrangler_spark.operators.interval_global import (
    identify_intervals_global,
)
from pywrangler_spark.operators.interval_identifier import (
    IntervalIdentifier,
    identify_intervals,
)
from pywrangler_spark.operators.sessionize import (
    sessionize_gap,
    session_stats,
)

__all__ = [
    "IntervalIdentifier",
    "identify_intervals",
    "identify_intervals_global",
    "sessionize_gap",
    "session_stats",
]
