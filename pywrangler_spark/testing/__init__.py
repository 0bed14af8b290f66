"""Engine-independent golden-data test kit.

- :mod:`plainframe` — typed literal frames with first-class NULL ≠ NaN
  and pandas/PySpark round-trips.
- :mod:`datatestcase` — declarative golden input/output cases with
  engine adapters and mutation testing.
- :mod:`mutants` — cell-level mutation machinery.
- :mod:`spec` — pure-Python sequential reference implementations used
  as executable specifications for property-based cross-checks.
"""

from pywrangler_spark.testing.datatestcase import (
    DataTestCase,
    EngineTester,
    TestCollection,
)
from pywrangler_spark.testing.mutants import (
    BaseMutant,
    FunctionMutant,
    MutantCollection,
    Mutation,
    RandomMutant,
    ValueMutant,
)
from pywrangler_spark.testing.plainframe import (
    NULL,
    PANDAS_NULL,
    NaN,
    PlainColumn,
    PlainFrame,
)
from pywrangler_spark.testing.spec import (
    naive_interval_ids,
    naive_sessionize_gap,
)

__all__ = [
    "NULL",
    "NaN",
    "PANDAS_NULL",
    "PlainColumn",
    "PlainFrame",
    "DataTestCase",
    "EngineTester",
    "TestCollection",
    "BaseMutant",
    "Mutation",
    "ValueMutant",
    "FunctionMutant",
    "RandomMutant",
    "MutantCollection",
    "naive_interval_ids",
    "naive_sessionize_gap",
]
