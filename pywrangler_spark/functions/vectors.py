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


# ---- int8 quantization -----------------------------------------------------
# The 100 TB memory lever for embedding columns: 4x smaller than f32 (8x
# smaller than the f64 compute form), integer dot products, and — because
# cosine is scale-invariant — the per-vector scale factors cancel, so
# scoring needs NO dequantization: score = dot_q / sqrt(|q_a|² |q_b|²),
# all-integer until the final division. Integer folds are exact, so
# quantized scores are bit-reproducible on any engine by construction.


def int8_scale(a: Column) -> Column:
    """Per-vector symmetric quantization scale: max|x| / 127. Zero
    vectors get NULL scale (quantize maps them to zeros)."""
    return F.nullif(
        F.array_max(F.transform(a, F.abs)) / F.lit(127.0), F.lit(0.0)
    )


def int8_quantize(a: Column, scale: Column) -> Column:
    """array<float|double> → array<tinyint>: round(x / scale), clamped by
    construction to [-127, 127]. NULL scale (zero vector) → zeros.

    The scale is zipped in via ``array_repeat`` rather than referenced
    inside the lambda: CollapseProject inlines scalar expressions into
    per-element lambdas, so a lambda-captured ``scale`` (itself an O(d)
    array_max fold) would re-run for EVERY element — O(d²) per row. As a
    zip operand it is evaluated once per row."""
    return F.zip_with(
        a,
        F.array_repeat(scale, F.size(a)),
        lambda x, s: F.coalesce(F.round(x / s, 0), F.lit(0.0)).cast(
            "tinyint"
        ),
    )


def int8_dot(qa: Column, qb: Column) -> Column:
    """Exact integer dot product of two int8 vectors (BIGINT fold —
    no overflow below ~5.7e14 dims)."""
    return F.aggregate(
        F.zip_with(
            qa, qb, lambda x, y: x.cast("bigint") * y.cast("bigint")
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def int8_norm_sq(qa: Column) -> Column:
    """|q|² as exact BIGINT; compute once per row and carry as a scalar
    column (same CollapseProject trap as ``unit_from_norm``)."""
    return int8_dot(qa, qa)
