"""Small shared helpers: argument normalization, introspection, dependency
gating.

Capability parity with the reference's ``pw/util/sanitizer.py:16-58``,
``pw/util/helper.py:11-37`` and ``pw/util/dependencies.py:33-87`` — fresh
implementations.
"""

from __future__ import annotations

import functools
import importlib
import inspect
from typing import Any, Callable, Iterable, Optional, Sequence, Tuple, Type


def ensure_iterable(
    value: Any,
    seq_type: Type = tuple,
    retain_none: bool = False,
) -> Optional[Sequence]:
    """Normalize a scalar-or-iterable argument into a sequence.

    Strings and bytes count as scalars (a column name is one value, not a
    sequence of characters). ``None`` becomes an empty sequence unless
    ``retain_none`` is set.

    Reference behavior: ``pw/util/sanitizer.py:16-58``.
    """
    if value is None:
        return None if retain_none else seq_type()
    if isinstance(value, (str, bytes)):
        return seq_type([value])
    if isinstance(value, Iterable):
        return seq_type(value)
    return seq_type([value])


def collect_init_params(cls: Type) -> Tuple[str, ...]:
    """Names of all ``__init__`` parameters over the MRO (excluding self,
    *args, **kwargs). Reference behavior: ``pw/util/helper.py:11-37``.
    """
    names: list[str] = []
    for klass in cls.__mro__:
        init = klass.__dict__.get("__init__")
        if init is None:
            continue
        sig = inspect.signature(init)
        for pname, param in sig.parameters.items():
            if pname == "self":
                continue
            if param.kind in (param.VAR_POSITIONAL, param.VAR_KEYWORD):
                continue
            if pname not in names:
                names.append(pname)
    return tuple(names)


def is_available(*modules: str) -> bool:
    """True iff every named module can be imported.

    Reference behavior: ``pw/util/dependencies.py:70-87``.
    """
    for name in modules:
        try:
            importlib.import_module(name)
        except ImportError:
            return False
    return True


def requires(*modules: str) -> Callable:
    """Decorator: raise a helpful ImportError when a soft dependency is
    missing, instead of failing deep inside the call.

    Reference behavior: ``pw/util/dependencies.py:33-67``.
    """

    def decorator(func: Callable) -> Callable:
        @functools.wraps(func)
        def wrapper(*args: Any, **kwargs: Any) -> Any:
            missing = [m for m in modules if not is_available(m)]
            if missing:
                raise ImportError(
                    f"{func.__qualname__} requires missing module(s): "
                    f"{', '.join(missing)}. Install them to use this feature."
                )
            return func(*args, **kwargs)

        return wrapper

    return decorator
