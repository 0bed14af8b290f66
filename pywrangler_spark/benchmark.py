"""Wall-time and memory profilers.

Capability parity with the reference's ``pw/benchmark.py`` (531 LoC) +
``pw/pyspark/benchmark.py`` — fresh implementation, and it closes the
reference's open TODO (``pw/pyspark/benchmark.py:3``): a working memory
profiler for the PySpark engine (RSS sampling of the local JVM+driver
process tree; on a real cluster use the Spark UI / metrics REST API,
which this module cannot see from the driver).
"""

from __future__ import annotations

import os
import statistics
import threading
import time
from typing import Any, Callable, Dict, List, Optional

from pyspark.sql import DataFrame


class TimeProfiler:
    """best/median/worst/std wall times of a callable over N runs
    (reference: ``pw/benchmark.py:428-531``)."""

    def __init__(self, func: Callable[..., Any], runs: int = 5):
        if runs < 1:
            raise ValueError("runs must be >= 1")
        self.func = func
        self.runs = runs
        self.timings: List[float] = []

    def profile(self, *args: Any, **kwargs: Any) -> "TimeProfiler":
        self.timings = []
        for _ in range(self.runs):
            t0 = time.perf_counter()
            self.func(*args, **kwargs)
            self.timings.append(time.perf_counter() - t0)
        return self

    @property
    def best(self) -> float:
        return min(self.timings)

    @property
    def worst(self) -> float:
        return max(self.timings)

    @property
    def median(self) -> float:
        return statistics.median(self.timings)

    @property
    def std(self) -> float:
        return statistics.pstdev(self.timings) if len(self.timings) > 1 else 0.0

    def report(self) -> Dict[str, float]:
        return {
            "best": self.best,
            "median": self.median,
            "worst": self.worst,
            "std": self.std,
            "runs": self.runs,
        }


class SparkTimeProfiler(TimeProfiler):
    """Times a DataFrame-producing function, forcing execution with
    ``count()``; optionally persists the input first so the measured
    time excludes the scan (reference ``pw/pyspark/benchmark.py:21-58``).
    """

    def __init__(
        self,
        func: Callable[[DataFrame], DataFrame],
        runs: int = 5,
        cache_input: bool = False,
    ):
        self.cache_input = cache_input

        def forced(df: DataFrame) -> int:
            return func(df).count()

        super().__init__(forced, runs)

    def profile(self, df: DataFrame, **kwargs: Any) -> "SparkTimeProfiler":
        cached = None
        if self.cache_input:
            cached = df.persist()
            cached.count()  # materialize before timing
            df = cached
        try:
            return super().profile(df, **kwargs)
        finally:
            if cached is not None:
                cached.unpersist(blocking=True)


def _rss_bytes() -> int:
    """Resident set size of this process (linux)."""
    with open("/proc/self/statm") as fh:
        return int(fh.read().split()[1]) * os.sysconf("SC_PAGE_SIZE")


class MemoryProfiler:
    """Peak-minus-baseline RSS while running a callable, sampled by a
    background thread (interval seconds). In ``local[*]`` mode the JVM
    executors share this process tree, so driver RSS reflects the whole
    job; on a cluster use the executor metrics endpoint instead."""

    def __init__(
        self,
        func: Callable[..., Any],
        runs: int = 3,
        interval: float = 0.01,
    ):
        self.func = func
        self.runs = runs
        self.interval = interval
        self.increases: List[int] = []

    def profile(self, *args: Any, **kwargs: Any) -> "MemoryProfiler":
        self.increases = []
        for _ in range(self.runs):
            baseline = _rss_bytes()
            peak = baseline
            stop = threading.Event()

            def sampler():
                nonlocal peak
                while not stop.is_set():
                    peak = max(peak, _rss_bytes())
                    time.sleep(self.interval)

            t = threading.Thread(target=sampler, daemon=True)
            t.start()
            try:
                self.func(*args, **kwargs)
            finally:
                stop.set()
                t.join()
            peak = max(peak, _rss_bytes())
            self.increases.append(peak - baseline)
        return self

    @property
    def max_usage(self) -> int:
        return max(self.increases)

    @property
    def median_usage(self) -> float:
        return statistics.median(self.increases)

    def report(self) -> Dict[str, float]:
        return {
            "median_increase_bytes": self.median_usage,
            "max_increase_bytes": self.max_usage,
            "runs": self.runs,
        }
