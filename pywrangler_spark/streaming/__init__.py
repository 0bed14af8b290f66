"""Structured Streaming variants of the batch operators."""

from pywrangler_spark.streaming.sessionize import stream_session_stats
from pywrangler_spark.streaming.interval import stream_identify_intervals

__all__ = ["stream_session_stats", "stream_identify_intervals"]
