"""Engine-independent golden-data test kit.

spec: pure-Python sequential reference implementations used as executable
specifications for property-based cross-checks.
PlainFrame / DataTestCase / mutants: typed literal frames with first-class
NULL vs NaN, golden cases, and mutation testing (imported lazily — see the
submodules).
"""

from pywrangler_spark.testing.spec import (
    naive_interval_ids,
    naive_sessionize_gap,
)

__all__ = ["naive_interval_ids", "naive_sessionize_gap"]
