"""Set operators (SURVEY.md §2.7 U1)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """U1: positional UNION DISTINCT — the reference's date-domain
    builder unions arrdate/depdate *by position* (etl.py:417-419), so
    this deliberately uses ``union`` not ``unionByName`` (SURVEY.md
    §7.4). Physical: UnionExec (no shuffle) + hash aggregate for the
    distinct."""
    return a.union(b).distinct()


def union_by_name(a: DataFrame, b: DataFrame, allow_missing: bool = False) -> DataFrame:
    """Schema-safe union for everything that isn't replicating U1."""
    return a.unionByName(b, allowMissingColumns=allow_missing)
