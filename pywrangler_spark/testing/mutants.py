"""Mutation testing for golden data test cases.

A *mutant* perturbs the input PlainFrame; a correct transformation must
produce a different output for the mutated input ("the mutant is
killed") — otherwise the test data fails to pin the behavior it claims
to. Capability parity with the reference's
``pw/util/testing/mutants.py`` (554 LoC) — fresh implementation.
"""

from __future__ import annotations

import datetime as _dt
import random
from dataclasses import dataclass
from typing import Any, Callable, List, Optional, Sequence

from pywrangler_spark.testing.plainframe import NULL, PlainFrame


@dataclass(frozen=True)
class Mutation:
    """A single cell change."""

    column: str
    row: int
    value: Any

    def key(self):
        return (self.column, self.row)


class BaseMutant:
    """Interface: generate cell mutations for a given parent frame."""

    def generate_mutations(self, parent: PlainFrame) -> List[Mutation]:
        raise NotImplementedError

    def mutate(self, parent: PlainFrame) -> PlainFrame:
        mutations = self.generate_mutations(parent)
        self._check(mutations, parent)
        edits = {}
        for m in mutations:
            edits.setdefault(m.column, {})[m.row] = m.value
        return parent.modify(edits)

    @staticmethod
    def _check(mutations: List[Mutation], parent: PlainFrame) -> None:
        if not mutations:
            raise ValueError("mutant generated no mutations")
        keys = [m.key() for m in mutations]
        if len(set(keys)) != len(keys):
            raise ValueError(f"duplicate mutations for cells: {keys}")
        for m in mutations:
            before = parent.get_column(m.column).values[m.row]
            same = (before is NULL and m.value is NULL) or (
                before is not NULL and m.value is not NULL and before == m.value
            )
            if same:
                raise ValueError(
                    f"mutation {m} does not change the cell value {before!r}"
                )

    @classmethod
    def from_any(cls, obj: Any) -> "BaseMutant":
        """dict → ValueMutant(s), callable → FunctionMutant, passthrough
        for mutant instances; lists handled by from_multiple_any."""
        if isinstance(obj, BaseMutant):
            return obj
        if isinstance(obj, Mutation):
            return ValueMutant(obj.column, obj.row, obj.value)
        if isinstance(obj, dict):
            mutants = [
                ValueMutant(column, row, value)
                for (column, row), value in obj.items()
            ]
            return mutants[0] if len(mutants) == 1 else MutantCollection(mutants)
        if callable(obj):
            return FunctionMutant(obj)
        raise TypeError(f"cannot build mutant from {type(obj)}")

    @classmethod
    def from_multiple_any(cls, obj: Any) -> List["BaseMutant"]:
        if obj is None:
            return []
        if isinstance(obj, (list, tuple)):
            return [cls.from_any(x) for x in obj]
        return [cls.from_any(obj)]


@dataclass(frozen=True)
class ValueMutant(BaseMutant):
    """Set one cell to a fixed value."""

    column: str
    row: int
    value: Any

    def generate_mutations(self, parent: PlainFrame) -> List[Mutation]:
        return [Mutation(self.column, self.row, self.value)]


class FunctionMutant(BaseMutant):
    """Delegate mutation generation to ``func(parent) -> [Mutation]``."""

    def __init__(self, func: Callable[[PlainFrame], List[Mutation]]):
        self.func = func

    def generate_mutations(self, parent: PlainFrame) -> List[Mutation]:
        return list(self.func(parent))


class RandomMutant(BaseMutant):
    """Seeded, dtype-aware random cell flips.

    Picks ``count`` distinct cells (optionally restricted to given
    columns/rows) and replaces each with a random value of the column's
    dtype, guaranteed different from the current value.
    """

    def __init__(
        self,
        count: int = 1,
        columns: Optional[Sequence[str]] = None,
        rows: Optional[Sequence[int]] = None,
        seed: int = 1,
    ):
        self.count = count
        self.columns = list(columns) if columns else None
        self.rows = list(rows) if rows else None
        self.seed = seed

    def generate_mutations(self, parent: PlainFrame) -> List[Mutation]:
        rng = random.Random(self.seed)
        columns = self.columns or parent.columns
        rows = self.rows if self.rows is not None else range(parent.n_rows)
        cells = [(c, r) for c in columns for r in rows]
        if not cells:
            raise ValueError("no cells available to mutate")
        count = min(self.count, len(cells))
        chosen = rng.sample(cells, count)
        return [
            Mutation(c, r, self._random_value(parent, c, r, rng))
            for c, r in chosen
        ]

    @staticmethod
    def _random_value(
        parent: PlainFrame, column: str, row: int, rng: random.Random
    ) -> Any:
        col = parent.get_column(column)
        current = col.values[row]
        generators = {
            "bool": lambda: rng.choice([True, False]),
            "int": lambda: rng.randint(-(10**6), 10**6),
            "float": lambda: rng.uniform(-(10**6), 10**6),
            "str": lambda: "mutant_" + "".join(
                rng.choices("abcdefghijklmnopqrstuvwxyz", k=8)
            ),
            "datetime": lambda: _dt.datetime(
                rng.randint(1980, 2049),
                rng.randint(1, 12),
                rng.randint(1, 28),
                rng.randint(0, 23),
                rng.randint(0, 59),
            ),
        }
        gen = generators[col.dtype]
        for _ in range(100):
            value = gen()
            different = (current is NULL) or value != current
            if different:
                return value
        raise RuntimeError("could not generate a differing value")  # pragma: no cover


class MutantCollection(BaseMutant):
    """Apply several mutants as one combined mutant."""

    def __init__(self, mutants: Sequence[Any]):
        self.mutants = [BaseMutant.from_any(m) for m in mutants]

    def generate_mutations(self, parent: PlainFrame) -> List[Mutation]:
        mutations: List[Mutation] = []
        for m in self.mutants:
            mutations.extend(m.generate_mutations(parent))
        return mutations
