"""Vector math over ``array<float>`` embedding columns — pure built-in
higher-order functions (``zip_with`` + ``aggregate``), JVM-side, no
Python round trip. Sums fold left-to-right, matching DuckDB's
sequential list kernels closely enough that a round-to-4-decimals on
cosine similarity is bit-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .rounding import round_fixed


def to_double_array(col: Column | str) -> Column:
    """Cast array<float> -> array<double> before arithmetic, so Spark
    and the DuckDB oracle (``::DOUBLE[]``) accumulate at the same
    precision."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot_col(a: Column, b: Column) -> Column:
    """Dot product via zip_with + left-fold aggregate."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    """L2 norm."""
    return F.sqrt(dot_col(a, a))


def cosine_cols(a: Column, b: Column, decimals: int | None = 4) -> Column:
    """Cosine similarity, optionally rounded for cross-engine-stable
    comparison and deterministic rank ordering."""
    cos = dot_col(a, b) / (norm_col(a) * norm_col(b))
    return round_fixed(cos, decimals) if decimals is not None else cos
