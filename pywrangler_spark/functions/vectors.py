"""Dense-vector column functions over ``array<float|double>`` columns.

Pure ``F.zip_with`` / ``F.aggregate`` expression trees — element-wise work
happens in the JVM inside codegen, no Python UDFs, no MLlib ``Vector``
boxing. Folds run left-to-right in index order, so results are
bit-reproducible and match an index-ordered SQL fold.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column) -> Column:
    """Cast array<float> → array<double> so all arithmetic is f64 (matches
    the oracle's ``::DOUBLE[]`` and avoids f32 accumulation noise)."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product: fold of zip_with products, in index order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a| |b|); null-safe zero-norm → NULL (division by zero)."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


def unit_from_norm(a: Column, norm: Column) -> Column:
    """a / norm (zero norm → NULLs). ``norm`` must be a materialized
    column, not an inlined ``l2_norm(a)`` expression — Catalyst would
    re-evaluate the norm fold for every element of the transform."""
    n = F.nullif(norm, F.lit(0.0))
    return F.transform(a, lambda x: x / n)
