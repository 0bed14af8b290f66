"""Relational / window operators."""

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
    "sessionize_gap",
    "session_stats",
]
