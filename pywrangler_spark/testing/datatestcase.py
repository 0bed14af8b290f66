"""DataTestCase: declarative golden input/output test cases, runnable
against multiple engines, with mutation testing.

Capability parity with the reference's
``pw/util/testing/datatestcase.py`` (572 LoC) — fresh implementation.

Usage::

    class SingleInterval(DataTestCase):
        def input(self):
            return {"order:i": [1, 2, 3], "marker:i": [1, 0, 2]}

        def output(self):
            return {"order:i": [1, 2, 3], "marker:i": [1, 0, 2],
                    "iids:i": [1, 1, 1]}

        def mutants(self):
            return [ValueMutant("marker", 0, 0)]

    SingleInterval().test(my_transform_func, engine="pyspark", spark=spark)

The engine adapter converts the input PlainFrame to the engine's frame
type, applies ``func``, converts the result back, and asserts equality
with the expected output (row-order-insensitive). Every declared mutant
is then applied to the input and must *change* the output (be
"killed"), proving the golden data actually pins the semantics.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence

from pywrangler_spark.testing.mutants import BaseMutant
from pywrangler_spark.testing.plainframe import PlainFrame


class EngineTester:
    """Run a whole-dataframe function on a concrete engine and compare
    against golden output."""

    def pandas(
        self,
        case: "DataTestCase",
        func: Callable,
        **kwargs: Any,
    ) -> None:
        def runner(frame: PlainFrame) -> PlainFrame:
            result = func(frame.to_pandas())
            return PlainFrame.from_pandas(
                result, dtypes=case.expected_output().dtypes
            )

        self._assert_with_mutants(case, runner)

    def pyspark(
        self,
        case: "DataTestCase",
        func: Callable,
        spark=None,
        repartition: Optional[int] = None,
        **kwargs: Any,
    ) -> None:
        if spark is None:
            from pywrangler_spark.session import get_spark

            spark = get_spark("datatestcase")

        def runner(frame: PlainFrame) -> PlainFrame:
            df = frame.to_pyspark(spark)
            if repartition is not None:
                df = df.repartition(repartition)
            return PlainFrame.from_pyspark(func(df))

        self._assert_with_mutants(case, runner)

    @staticmethod
    def _assert_with_mutants(
        case: "DataTestCase", runner: Callable[[PlainFrame], PlainFrame]
    ) -> None:
        expected = case.expected_output()
        got = runner(case.expected_input())
        expected.assert_equal(got)

        for mutant in case.expected_mutants():
            mutated = mutant.mutate(case.expected_input())
            mutated_out = runner(mutated)
            try:
                expected.assert_equal(mutated_out)
            except AssertionError:
                continue  # mutant killed — good
            raise AssertionError(
                f"mutant survived: {mutant!r} did not change the output; "
                "the golden data does not pin this behavior"
            )


class DataTestCase:
    """Subclass and define ``input``, ``output`` and optionally
    ``mutants`` (attributes or zero-arg methods; any PlainFrame-able)."""

    engine_tester = EngineTester()

    def _resolve(self, name: str) -> Any:
        attr = getattr(self, name, None)
        return attr() if callable(attr) else attr

    def expected_input(self) -> PlainFrame:
        return PlainFrame.from_any(self._resolve("input"))

    def expected_output(self) -> PlainFrame:
        return PlainFrame.from_any(self._resolve("output"))

    def expected_mutants(self) -> List[BaseMutant]:
        return BaseMutant.from_multiple_any(self._resolve("mutants"))

    def test(
        self, func: Callable, engine: str = "pyspark", **kwargs: Any
    ) -> None:
        tester = getattr(self.engine_tester, engine, None)
        if tester is None:
            raise ValueError(f"unknown engine {engine!r}")
        tester(self, func, **kwargs)


class TestCollection:
    """A named group of DataTestCase classes with pytest parametrization
    sugar: ``@collection.pytest_parametrize`` injects a ``datatestcase``
    fixture argument per case."""

    def __init__(self, cases: Sequence[type], name: Optional[str] = None):
        self.cases = list(cases)
        self.name = name or "cases"

    @property
    def names(self) -> List[str]:
        return [c.__name__ for c in self.cases]

    @property
    def pytest_parametrize(self):
        import pytest

        return pytest.mark.parametrize(
            "datatestcase", self.cases, ids=self.names
        )
