"""The SQL surface: the same engine through ``spark.sql``.

The DataFrame queries in queries_parity/queries_llm declare plans via
the Python API; these declare them as SQL text over registered temp
views — same Catalyst pipeline, same physical plans, and the natural
entry point for users porting SQL workloads. The query text is shared
with the DuckDB oracle up to dialect spelling (string cast), so the
acceptance check covers parser + analyzer + optimizer end to end.

Scale notes: both queries are multiway star-ish joins that Catalyst
(with AQE) broadcasts where the build side is small; revenue sums are
fixed-point rounded for cross-engine stability and ordered with
unique-key tie-breaks so LIMIT is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.rounding import sql_round_fixed
from ..sources.readers import read_table

_TABLES = ["customer", "orders", "lineitem", "supplier", "nation", "region", "part"]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the fixture tables as temp views for spark.sql use."""
    for t in _TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)


_REV = sql_round_fixed("sum(l_extendedprice * (1 - l_discount))", 2)

#: TPC-H Q3-shaped (shipping priority): {cast} is the dialect's
#: to-string cast of a timestamp.
_Q3 = """
SELECT l_orderkey,
       {rev} AS revenue_r,
       CAST(o_orderdate AS {str_t}) AS order_date,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1998-06-01'
  AND l_shipdate  > DATE '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_r DESC, l_orderkey
LIMIT 10
"""

#: TPC-H Q5-shaped (local supplier volume by nation within a region).
_Q5 = """
SELECT n_name,
       {rev} AS revenue_r,
       CAST(count(*) AS BIGINT) AS n_items
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01'
  AND o_orderdate <  DATE '1998-01-01'
GROUP BY n_name
"""


def tpch_q3_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 via spark.sql: 3-way join, filtered both sides, grouped
    revenue, deterministic top-10."""
    register_views(spark, sf_dir)
    return spark.sql(_Q3.format(rev=_REV, str_t="STRING"))


def tpch_q5_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 via spark.sql: 6-way join down a region -> nation -> supplier
    chain with a co-nationality predicate."""
    register_views(spark, sf_dir)
    return spark.sql(_Q5.format(rev=_REV))


ORACLE_TPCH_Q3 = _Q3.format(rev=_REV, str_t="VARCHAR")
ORACLE_TPCH_Q5 = _Q5.format(rev=_REV)

SQL_QUERIES = {
    "tpch_q3_sql": (tpch_q3_sql, ORACLE_TPCH_Q3, "SQL surface: Q3 join/group/topk"),
    "tpch_q5_sql": (tpch_q5_sql, ORACLE_TPCH_Q5, "SQL surface: Q5 6-way join"),
}
