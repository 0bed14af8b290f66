"""PlainFrame: a typed, engine-independent literal data frame for golden
tests.

Capability parity with the reference's ``pw/util/testing/plainframe.py``
(1442 LoC) — fresh implementation. Core contracts:

- exactly five primitive dtypes: ``bool int float str datetime``, with
  one-letter abbreviations ``b i f s d`` usable in ``"name:dtype"``
  typed column annotations;
- missing data is first-class and **NULL ≠ NaN**: ``NULL`` is a totally
  ordered singleton (so rows containing NULLs sort deterministically),
  NaN is an ordinary float value; both survive engine round-trips;
- conversion matrix: plain python / dict / pandas / PySpark, both
  directions, plus ``from_any``;
- cell-level ``modify`` (the mutation-testing hook), column subsetting,
  equality assertion with optional row/column order insensitivity.
"""

from __future__ import annotations

import datetime as _dt
import math
from typing import Any, Dict, Iterable, List, Mapping, Optional, Sequence, Tuple

#: the reference's five primitive dtypes, plus the two extended dtypes
#: the multimodal/embedding operators need (the ONE deliberate extension
#: over the reference's type system — SURVEY.md §7 M5): ``floatarray``
#: (array<double>, embeddings) and ``binary`` (opaque blobs)
TYPES = ("bool", "int", "float", "str", "datetime", "floatarray", "binary")
_ABBREVIATIONS = {
    "b": "bool", "i": "int", "f": "float", "s": "str", "d": "datetime",
    "fa": "floatarray", "y": "binary",
}


class _NullValue:
    """Singleton NULL with total ordering (NULL sorts before everything)
    and self-equality — so golden rows containing NULLs can be sorted and
    compared deterministically."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self) -> str:
        return "NULL"

    def __eq__(self, other: Any) -> bool:
        return isinstance(other, _NullValue)

    def __ne__(self, other: Any) -> bool:
        return not isinstance(other, _NullValue)

    def __hash__(self) -> int:
        return hash("__NULL__")

    def __lt__(self, other: Any) -> bool:
        return not isinstance(other, _NullValue)

    def __le__(self, other: Any) -> bool:
        return True

    def __gt__(self, other: Any) -> bool:
        return False

    def __ge__(self, other: Any) -> bool:
        return isinstance(other, _NullValue)


NULL = _NullValue()
NaN = float("nan")

#: sentinel forcing a NULL through pandas float columns (pandas cannot
#: distinguish NULL from NaN natively)
PANDAS_NULL = object()


def _is_nan(v: Any) -> bool:
    return isinstance(v, float) and v != v


def _normalize_dtype(dtype: str) -> str:
    dtype = dtype.strip().lower()
    dtype = _ABBREVIATIONS.get(dtype, dtype)
    if dtype not in TYPES:
        raise ValueError(f"unknown dtype {dtype!r}; valid: {TYPES}")
    return dtype


def _check_value(value: Any, dtype: str, column: str) -> Any:
    if value is NULL or value is None:
        return NULL
    if dtype == "bool":
        if isinstance(value, bool):
            return value
    elif dtype == "int":
        if isinstance(value, int) and not isinstance(value, bool):
            return value
    elif dtype == "float":
        if isinstance(value, float):
            return value
        if isinstance(value, int) and not isinstance(value, bool):
            return float(value)
    elif dtype == "str":
        if isinstance(value, str):
            return value
    elif dtype == "datetime":
        if isinstance(value, _dt.datetime):
            return value
        if isinstance(value, str):
            return _dt.datetime.fromisoformat(value)
    elif dtype == "floatarray":
        if isinstance(value, (list, tuple)) and all(
            isinstance(v, (int, float)) and not isinstance(v, bool)
            for v in value
        ):
            return tuple(float(v) for v in value)
    elif dtype == "binary":
        if isinstance(value, (bytes, bytearray)):
            return bytes(value)
    raise TypeError(
        f"column {column!r}: value {value!r} is not a valid {dtype}"
    )


class PlainColumn:
    """Immutable (name, dtype, values) triple."""

    __slots__ = ("name", "dtype", "values")

    def __init__(self, name: str, dtype: str, values: Iterable[Any]):
        object.__setattr__(self, "name", name)
        object.__setattr__(self, "dtype", _normalize_dtype(dtype))
        checked = tuple(_check_value(v, self.dtype, name) for v in values)
        object.__setattr__(self, "values", checked)

    def __setattr__(self, *_: Any):  # pragma: no cover
        raise AttributeError("PlainColumn is immutable")

    def __eq__(self, other: Any) -> bool:
        if not isinstance(other, PlainColumn):
            return NotImplemented
        if (self.name, self.dtype) != (other.name, other.dtype):
            return False
        return _values_equal(self.values, other.values)

    def __repr__(self) -> str:
        return f"PlainColumn({self.name}:{self.dtype}, {self.values!r})"


def _value_equal(a: Any, b: Any) -> bool:
    if a is NULL or b is NULL:
        return a is NULL and b is NULL
    if _is_nan(a) or _is_nan(b):
        return _is_nan(a) and _is_nan(b)
    if isinstance(a, float) or isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    if isinstance(a, tuple) and isinstance(b, tuple):  # floatarray
        return len(a) == len(b) and all(
            _value_equal(x, y) for x, y in zip(a, b)
        )
    return a == b


def _values_equal(a: Sequence[Any], b: Sequence[Any]) -> bool:
    return len(a) == len(b) and all(_value_equal(x, y) for x, y in zip(a, b))


def _sort_key(v: Any) -> Tuple:
    """Total order over mixed values incl. NULL/NaN for row sorting."""
    if v is NULL:
        return (0, "")
    if _is_nan(v):
        return (1, "")
    if isinstance(v, tuple):  # floatarray: NaN-safe elementwise key
        return (2, "tuple", tuple(_sort_key(x) for x in v))
    return (2, str(type(v).__name__), v if not isinstance(v, _dt.datetime) else v.isoformat())


class PlainFrame:
    """Columnar immutable literal frame. See module docstring."""

    def __init__(self, columns: Sequence[PlainColumn]):
        names = [c.name for c in columns]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate column names: {names}")
        lengths = {len(c.values) for c in columns}
        if len(lengths) > 1:
            raise ValueError(f"columns have differing lengths: {lengths}")
        self._columns = tuple(columns)
        self._n_rows = lengths.pop() if lengths else 0

    # -- accessors ----------------------------------------------------------

    @property
    def columns(self) -> List[str]:
        return [c.name for c in self._columns]

    @property
    def dtypes(self) -> List[str]:
        return [c.dtype for c in self._columns]

    @property
    def n_rows(self) -> int:
        return self._n_rows

    @property
    def n_cols(self) -> int:
        return len(self._columns)

    @property
    def plaincolumns(self) -> Tuple[PlainColumn, ...]:
        return self._columns

    def get_column(self, name: str) -> PlainColumn:
        for c in self._columns:
            if c.name == name:
                return c
        raise ValueError(f"column {name!r} not found; have {self.columns}")

    def __getitem__(self, key) -> "PlainFrame":
        if isinstance(key, str):
            names = [key]
        elif isinstance(key, slice):
            names = self.columns[key]
        else:
            names = list(key)
        return PlainFrame([self.get_column(n) for n in names])

    def rows(self) -> List[Tuple]:
        return [
            tuple(c.values[i] for c in self._columns)
            for i in range(self._n_rows)
        ]

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_plain(
        cls,
        data: Sequence[Sequence[Any]],
        columns: Sequence[str],
        dtypes: Optional[Sequence[str]] = None,
        row_wise: bool = True,
    ) -> "PlainFrame":
        """Build from literal data. ``columns`` may carry typed annotations
        (``"name:int"`` / ``"name:i"``) or ``dtypes`` is given separately."""
        names, parsed_dtypes = [], []
        for col in columns:
            if ":" in col:
                name, _, dtype = col.rpartition(":")
                names.append(name)
                parsed_dtypes.append(_normalize_dtype(dtype))
            else:
                names.append(col)
                parsed_dtypes.append(None)
        if dtypes is not None:
            if len(dtypes) != len(names):
                raise ValueError("dtypes length must match columns")
            parsed_dtypes = [_normalize_dtype(d) for d in dtypes]
        if any(d is None for d in parsed_dtypes):
            missing = [n for n, d in zip(names, parsed_dtypes) if d is None]
            raise ValueError(
                f"columns {missing} lack dtype annotations and no dtypes given"
            )
        if row_wise:
            data = list(zip(*data)) if data else [[] for _ in names]
        if len(data) != len(names):
            raise ValueError(
                f"{len(data)} data columns vs {len(names)} column names"
            )
        return cls(
            [
                PlainColumn(n, d, vals)
                for n, d, vals in zip(names, parsed_dtypes, data)
            ]
        )

    @classmethod
    def from_dict(cls, data: Mapping[str, Sequence[Any]]) -> "PlainFrame":
        """Keys are typed annotations ``"name:dtype"``; values are column
        value sequences."""
        return cls.from_plain(
            list(data.values()), list(data.keys()), row_wise=False
        )

    @classmethod
    def from_pandas(
        cls, df, dtypes: Optional[Sequence[str]] = None
    ) -> "PlainFrame":
        import numpy as np
        import pandas as pd

        columns = []
        for i, name in enumerate(df.columns):
            s = df[name]
            forced = _normalize_dtype(dtypes[i]) if dtypes else None
            if pd.api.types.is_bool_dtype(s):
                dtype, vals = "bool", [bool(v) for v in s]
            elif pd.api.types.is_integer_dtype(s):
                dtype, vals = "int", [int(v) for v in s]
            elif pd.api.types.is_float_dtype(s):
                # pandas cannot distinguish NULL from NaN; a float column
                # forced to int/bool treats NaN as NULL (reference
                # behavior for upcast-on-missing columns)
                if forced in ("int", "bool"):
                    dtype = forced
                    caster = int if forced == "int" else bool
                    vals = [
                        NULL if (v is None or v != v) else caster(v)
                        for v in s
                    ]
                else:
                    dtype = "float"
                    vals = [NULL if v is None else float(v) for v in s]
            elif pd.api.types.is_datetime64_any_dtype(s):
                dtype = "datetime"
                vals = [
                    NULL if pd.isna(v) else v.to_pydatetime() for v in s
                ]
            else:
                vals = [
                    NULL
                    if (v is None or v is PANDAS_NULL or (isinstance(v, float) and v != v))
                    else v
                    for v in s
                ]
                sample = next((v for v in vals if v is not NULL), None)
                if forced is None and isinstance(sample, (list, tuple)):
                    dtype = "floatarray"
                elif forced is None and isinstance(
                    sample, (bytes, bytearray)
                ):
                    dtype = "binary"
                else:
                    dtype = forced or "str"
            columns.append(PlainColumn(name, forced or dtype, vals))
        return cls(columns)

    @classmethod
    def from_pyspark(cls, df) -> "PlainFrame":
        """Collect a (small!) PySpark DataFrame. Spark ``None`` → NULL;
        Double NaN stays NaN — the NULL/NaN distinction survives."""
        from pyspark.sql import types as T

        mapping = {
            T.BooleanType: "bool",
            T.ByteType: "int",
            T.ShortType: "int",
            T.IntegerType: "int",
            T.LongType: "int",
            T.FloatType: "float",
            T.DoubleType: "float",
            T.StringType: "str",
            T.TimestampType: "datetime",
            T.TimestampNTZType: "datetime",
            T.DateType: "datetime",
            T.BinaryType: "binary",
        }
        dtypes = []
        for field in df.schema.fields:
            if isinstance(field.dataType, T.ArrayType) and isinstance(
                field.dataType.elementType,
                (T.FloatType, T.DoubleType, T.IntegerType, T.LongType),
            ):
                dtypes.append("floatarray")
                continue
            for spark_type, plain in mapping.items():
                if isinstance(field.dataType, spark_type):
                    dtypes.append(plain)
                    break
            else:
                raise TypeError(
                    f"unsupported Spark dtype {field.dataType} for PlainFrame"
                )
        rows = df.collect()
        columns = []
        for idx, field in enumerate(df.schema.fields):
            vals = []
            for row in rows:
                v = row[idx]
                if v is None:
                    vals.append(NULL)
                elif dtypes[idx] == "datetime" and isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
                    vals.append(_dt.datetime(v.year, v.month, v.day))
                elif dtypes[idx] == "float":
                    vals.append(float(v))
                elif dtypes[idx] == "floatarray":
                    vals.append(tuple(float(x) for x in v))
                elif dtypes[idx] == "binary":
                    vals.append(bytes(v))
                else:
                    vals.append(v)
            columns.append(PlainColumn(field.name, dtypes[idx], vals))
        return cls(columns)

    @classmethod
    def from_any(cls, obj: Any) -> "PlainFrame":
        if isinstance(obj, PlainFrame):
            return obj
        if isinstance(obj, Mapping):
            return cls.from_dict(obj)
        try:
            import pandas as pd

            if isinstance(obj, pd.DataFrame):
                return cls.from_pandas(obj)
        except ImportError:  # pragma: no cover
            pass
        try:
            from pyspark.sql import DataFrame as SparkDataFrame

            if isinstance(obj, SparkDataFrame):
                return cls.from_pyspark(obj)
        except ImportError:  # pragma: no cover
            pass
        raise TypeError(f"cannot build PlainFrame from {type(obj)}")

    # -- exporters ----------------------------------------------------------

    def to_plain(self) -> Tuple[List[List[Any]], List[str], List[str]]:
        return (
            [list(c.values) for c in self._columns],
            self.columns,
            self.dtypes,
        )

    def to_dict(self) -> Dict[str, Tuple]:
        return {
            f"{c.name}:{c.dtype}": c.values for c in self._columns
        }

    def to_pandas(self):
        import numpy as np
        import pandas as pd

        data = {}
        for c in self._columns:
            if c.dtype in ("int", "bool") and any(v is NULL for v in c.values):
                # pandas upcasts missing int/bool to float (reference parity)
                data[c.name] = pd.Series(
                    [np.nan if v is NULL else float(v) for v in c.values],
                    dtype="float64",
                )
            elif c.dtype == "float":
                data[c.name] = pd.Series(
                    [np.nan if v is NULL else v for v in c.values],
                    dtype="float64",
                )
            elif c.dtype == "datetime":
                data[c.name] = pd.Series(
                    [pd.NaT if v is NULL else v for v in c.values],
                    dtype="datetime64[ns]",
                )
            else:
                data[c.name] = pd.Series(
                    [None if v is NULL else v for v in c.values],
                    dtype="object" if c.dtype == "str" else None,
                )
        return pd.DataFrame(data, columns=self.columns)

    def to_pyspark(self, spark):
        from pyspark.sql import types as T

        mapping = {
            "bool": T.BooleanType(),
            "int": T.LongType(),
            "float": T.DoubleType(),
            "str": T.StringType(),
            "datetime": T.TimestampType(),
            "floatarray": T.ArrayType(T.DoubleType(), False),
            "binary": T.BinaryType(),
        }
        schema = T.StructType(
            [
                T.StructField(c.name, mapping[c.dtype], True)
                for c in self._columns
            ]
        )
        array_cols = {
            i for i, c in enumerate(self._columns)
            if c.dtype == "floatarray"
        }
        rows = [
            tuple(
                None if v is NULL
                # tuples would be read as STRUCTS by createDataFrame
                else (list(v) if i in array_cols else v)
                for i, v in enumerate(row)
            )
            for row in self.rows()
        ]
        return spark.createDataFrame(rows, schema=schema)

    # -- algebra ------------------------------------------------------------

    def modify(
        self, modifications: Mapping[str, Mapping[int, Any]]
    ) -> "PlainFrame":
        """Cell-level edits: {column: {row_index: new_value}} → new frame."""
        new_columns = []
        for c in self._columns:
            edits = modifications.get(c.name)
            if not edits:
                new_columns.append(c)
                continue
            vals = list(c.values)
            for row_idx, value in edits.items():
                if not 0 <= row_idx < self._n_rows:
                    raise IndexError(
                        f"row {row_idx} out of range (n_rows={self._n_rows})"
                    )
                vals[row_idx] = value
            new_columns.append(PlainColumn(c.name, c.dtype, vals))
        unknown = set(modifications) - set(self.columns)
        if unknown:
            raise ValueError(f"unknown columns in modifications: {unknown}")
        return PlainFrame(new_columns)

    # -- comparison ---------------------------------------------------------

    def __eq__(self, other: Any) -> bool:
        if not isinstance(other, PlainFrame):
            return NotImplemented
        return self._columns == other._columns

    def assert_equal(
        self,
        other: "PlainFrame",
        check_column_order: bool = True,
        check_row_order: bool = False,
    ) -> None:
        """Rich equality assertion. Row order is ignored by default
        (engine results have no deterministic order); column order checked
        by default."""
        other = PlainFrame.from_any(other)
        if sorted(self.columns) != sorted(other.columns):
            raise AssertionError(
                f"column names differ: {self.columns} vs {other.columns}"
            )
        if check_column_order and self.columns != other.columns:
            raise AssertionError(
                f"column order differs: {self.columns} vs {other.columns}"
            )
        a = self
        b = other[[*a.columns]]
        if a.dtypes != b.dtypes:
            raise AssertionError(
                f"dtypes differ: {list(zip(a.columns, a.dtypes))} vs "
                f"{list(zip(b.columns, b.dtypes))}"
            )
        if a.n_rows != b.n_rows:
            raise AssertionError(f"row counts differ: {a.n_rows} vs {b.n_rows}")
        rows_a, rows_b = a.rows(), b.rows()
        if not check_row_order:
            key = lambda row: tuple(_sort_key(v) for v in row)
            rows_a, rows_b = sorted(rows_a, key=key), sorted(rows_b, key=key)
        for i, (ra, rb) in enumerate(zip(rows_a, rows_b)):
            if not all(_value_equal(x, y) for x, y in zip(ra, rb)):
                raise AssertionError(
                    f"row {i} differs: {ra} vs {rb}"
                )

    # -- display ------------------------------------------------------------

    def __repr__(self) -> str:
        header = [
            f"{c.name} ({c.dtype})" for c in self._columns
        ]
        body = [
            [repr(v) for v in row] for row in self.rows()[:20]
        ]
        widths = [
            max(len(h), *(len(r[i]) for r in body)) if body else len(h)
            for i, h in enumerate(header)
        ]
        def fmt(cells):
            return " | ".join(c.ljust(w) for c, w in zip(cells, widths))
        lines = [fmt(header), "-+-".join("-" * w for w in widths)]
        lines += [fmt(r) for r in body]
        if self._n_rows > 20:
            lines.append(f"... ({self._n_rows} rows total)")
        return "\n".join(lines)
