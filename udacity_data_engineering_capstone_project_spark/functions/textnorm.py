"""Text normalization / tokenization, generated per SQL dialect.

Spark's ``regexp_replace`` replaces all matches; DuckDB's replaces only
the first unless passed the ``'g'`` flag — so normalization SQL is
generated per dialect from one spec, keeping the Spark operator and the
DuckDB oracle character-identical in behavior.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sql_norm_text(expr: str, dialect: str) -> str:
    """Lowercase, strip non-alphanumerics to spaces, collapse runs of
    whitespace, trim. Same visible behavior in both dialects."""
    if dialect == "spark":
        inner = f"regexp_replace(lower({expr}), '[^a-z0-9]+', ' ')"
    elif dialect == "duckdb":
        inner = f"regexp_replace(lower({expr}), '[^a-z0-9]+', ' ', 'g')"
    else:
        raise ValueError(f"unknown dialect {dialect!r}")
    return f"trim({inner})"


def sql_tokens(expr: str, dialect: str) -> str:
    """Whitespace tokenization of normalized text -> array/list of words."""
    norm = sql_norm_text(expr, dialect)
    if dialect == "spark":
        return f"split({norm}, ' ')"
    return f"string_split({norm}, ' ')"


def tokens_col(col: Column | str) -> Column:
    """Spark Column version of :func:`sql_tokens` (for DataFrame-API
    call sites)."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))
    return F.split(norm, " ")
