"""Cross-engine deterministic rounding.

Spark's ``round()`` on doubles goes through the shortest decimal
representation with HALF_UP; DuckDB rounds the binary value — e.g. an
average stored as 4201.31499999...97 rounds to 4201.32 in Spark and
4201.31 in DuckDB. For oracle-stable results, both sides instead use
the identical IEEE expression ``floor(x * 10^d + 0.5) / 10^d`` —
same operations, same order, bit-identical output.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_fixed(col: Column, decimals: int = 2) -> Column:
    """floor(x * 10^d + 0.5) / 10^d as a Spark Column (double out)."""
    m = 10 ** decimals
    return F.floor(col * F.lit(m) + F.lit(0.5)) / F.lit(m)


def sql_round_fixed(expr: str, decimals: int = 2) -> str:
    """The same formula as SQL text (valid in Spark SQL and DuckDB)."""
    m = 10 ** decimals
    return f"(floor(({expr}) * {m} + 0.5) / {m})"
