"""Date/time column expressions (SURVEY.md §2.8 F8-F10, §2.10 U-1/U-2).

The reference wraps SAS-date conversion and season classification in
row-at-a-time Python UDFs (``convert_date`` etl.py:39, ``get_season``
etl.py:63-79) — the only non-JVM execution in its whole pipeline
(SURVEY.md §4.2). Here both are pure built-in column expressions, so
they stay inside whole-stage codegen and cost no Python round trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: SAS epoch: days are counted from 1960-01-01 (reference etl.py:39).
SAS_EPOCH = "1960-01-01"


def sas_to_date(col: Column | str) -> Column:
    """SAS day-offset int -> DateType. Null passes through (the UDF it
    replaces, etl.py:39, had explicit None-passthrough; ``date_add``
    already propagates null)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_add(F.to_date(F.lit(SAS_EPOCH)), c.cast("int"))


def date_to_sas(col: Column | str) -> Column:
    """DateType -> SAS day-offset int (inverse of :func:`sas_to_date`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.datediff(c, F.to_date(F.lit(SAS_EPOCH))).cast("int")


def season_expr(month: Column | str) -> Column:
    """Month int -> season name; mirrors ``get_season`` (etl.py:63-79):
    12/1/2 Winter, 3/4/5 Spring, 6/7/8 Summer, else Autumn — but as a
    CASE expression instead of a Python UDF. Null month -> null
    (the UDF returned None on exceptions)."""
    m = F.col(month) if isinstance(month, str) else month
    return (
        F.when(m.isNull(), F.lit(None).cast("string"))
        .when(m.isin(12, 1, 2), "Winter")
        .when(m.isin(3, 4, 5), "Spring")
        .when(m.isin(6, 7, 8), "Summer")
        .otherwise("Autumn")
    )


def is_weekend_expr(dow: Column | str) -> Column:
    """Spark ``dayofweek`` (1=Sunday..7=Saturday) -> 0/1 weekend flag.
    Weekend = {1, 7}, matching reference etl.py:429 exactly — do NOT
    "fix" to ISO (SURVEY.md §7.4)."""
    d = F.col(dow) if isinstance(dow, str) else dow
    return d.isin(1, 7).cast("int")


def date_attrs(df: DataFrame, date_col: str) -> DataFrame:
    """Expand a DateType column into the reference's date-dimension
    attributes (etl.py:424-439): year, month, day, week (ISO),
    dayofweek (1=Sunday), isweekend (0/1), season."""
    d = F.col(date_col)
    return (
        df.withColumn("year", F.year(d))
        .withColumn("month", F.month(d))
        .withColumn("day", F.dayofmonth(d))
        .withColumn("week", F.weekofyear(d))
        .withColumn("dayofweek", F.dayofweek(d))
        .withColumn("isweekend", is_weekend_expr(F.dayofweek(d)))
        .withColumn("season", season_expr(F.month(d)))
    )
