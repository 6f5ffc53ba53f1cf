"""Cleaning operators (SURVEY.md §2.2 P1-P15).

Thin, composable wrappers over the DataFrame API — each one maps to a
Catalyst-native primitive (no UDFs), so filters and projections still
reach the parquet scan after composition.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame


def drop_columns(df: DataFrame, *cols) -> DataFrame:
    """P1/P2: drop one or more columns (string names or qualified
    ``other_df.col`` references, e.g. after a same-name join)."""
    return df.drop(*cols)


def drop_null_rows(
    df: DataFrame, subset: list[str] | None = None, how: str = "any"
) -> DataFrame:
    """P3-P5: null-row filtering. ``subset`` keeps rows where those
    columns are all non-null (reference etl.py:105); ``how='all'`` drops
    rows that are entirely null (etl.py:106)."""
    return df.na.drop(how=how, subset=subset)


def fill_nulls(df: DataFrame, value, subset: list[str] | None = None) -> DataFrame:
    """P6: constant null-fill (reference fills pivot gaps with 0,
    etl.py:199 — missing combination means count 0, not unknown)."""
    return df.na.fill(value, subset=subset)


def dedup(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """P7: drop duplicate rows (full-row or key-subset). Physical plan
    is a hash aggregate on the dedup columns."""
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()


def cast_columns(df: DataFrame, casts: Mapping[str, str]) -> DataFrame:
    """P14: bulk column cast, ``{col: dtype}``. One ``withColumns`` call
    (single projection), not a chain of N projections."""
    return df.withColumns({c: df[c].cast(t) for c, t in casts.items()})


def rename_columns(df: DataFrame, renames: Mapping[str, str]) -> DataFrame:
    """P13: bulk rename ``{old: new}``. The reference chains up to 14
    ``withColumnRenamed`` calls (etl.py:148-159); this is a single
    ``withColumnsRenamed`` projection. Prefer aliasing inside ``agg()``
    where possible — then there is nothing to rename."""
    return df.withColumnsRenamed(dict(renames))


def with_columns(df: DataFrame, exprs: Mapping[str, Column]) -> DataFrame:
    """P15: add derived columns in one projection."""
    return df.withColumns(dict(exprs))
