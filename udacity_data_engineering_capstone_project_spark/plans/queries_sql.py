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


#: TPC-H Q4-shaped (late shipments by priority): a correlated EXISTS
#: that Catalyst decorrelates into a left-semi join on l_orderkey —
#: at scale this is one shuffle on the order key with the date filter
#: pushed to both parquet scans, no per-row subquery execution.
_Q4 = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_late
FROM orders
WHERE o_orderdate >= DATE '1996-01-01'
  AND o_orderdate <  DATE '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""

#: TPC-H Q7-shaped (bi-directional volume between two nations by ship
#: year): the two nation filters prune before the fact join; both
#: nation sides broadcast.
_Q7 = """
SELECT supp_nation,
       cust_nation,
       l_year,
       {rev} AS revenue_r
FROM (SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice, l_discount
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) shipping
GROUP BY supp_nation, cust_nation, l_year
"""

#: TPC-H Q8-shaped (market share of one supplier nation inside one
#: customer region, by order year). The share is a conditional-sum /
#: total-sum ratio computed in one aggregate pass; fixed-point rounded
#: at 6 decimals for cross-engine stability.
_Q8 = """
SELECT o_year,
       {share} AS mkt_share_r
FROM (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE') all_sales
GROUP BY o_year
"""

#: TPC-H Q11-shaped (nations holding an outsized share of supplier
#: account balance): HAVING over an uncorrelated scalar subquery — the
#: scalar is one tiny aggregate job whose result is folded into the
#: final filter, not a per-group recomputation.
_Q11 = """
SELECT n_name,
       {bal} AS nation_bal_r
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
HAVING sum(s_acctbal) > (SELECT sum(s_acctbal) / 20 FROM supplier)
"""

#: TPC-H Q17-shaped (revenue from small-quantity lineitems relative to
#: each part's average): a correlated scalar subquery on l_partkey.
#: Catalyst decorrelates to an aggregate-then-join on partkey — at
#: scale one extra shuffle over lineitem, not O(parts) subqueries.
_Q17 = """
SELECT p_brand,
       {rev2} AS small_qty_rev_r,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand IN ('Brand#11', 'Brand#22', 'Brand#23')
  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                    FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
GROUP BY p_brand
"""

#: TPC-H Q22-shaped (wealthy customers gone quiet, by nation):
#: uncorrelated scalar threshold + correlated NOT EXISTS anti-join.
_Q22 = """
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_cust,
       {bal2} AS total_bal_r
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= DATE '1998-06-01')
GROUP BY n_name
"""

_SHARE = sql_round_fixed(
    "sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END) / sum(volume)", 6
)
_BAL = sql_round_fixed("sum(s_acctbal)", 2)
_BAL2 = sql_round_fixed("sum(c_acctbal)", 2)
_REV2 = sql_round_fixed("sum(l_extendedprice)", 2)


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


def _sql_query(text: str):
    """A queries() entry that runs ``text`` through spark.sql over the
    registered fixture views (dialect-shared with the DuckDB oracle)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(text)

    return run


_Q4_TEXT = _Q4
_Q7_TEXT = _Q7.format(rev=_REV)
_Q8_TEXT = _Q8.format(share=_SHARE)
_Q11_TEXT = _Q11.format(bal=_BAL)
_Q17_TEXT = _Q17.format(rev2=_REV2)
_Q22_TEXT = _Q22.format(bal2=_BAL2)

ORACLE_TPCH_Q3 = _Q3.format(rev=_REV, str_t="VARCHAR")
ORACLE_TPCH_Q5 = _Q5.format(rev=_REV)

SQL_QUERIES = {
    "tpch_q3_sql": (tpch_q3_sql, ORACLE_TPCH_Q3, "SQL surface: Q3 join/group/topk"),
    "tpch_q5_sql": (tpch_q5_sql, ORACLE_TPCH_Q5, "SQL surface: Q5 6-way join"),
    "tpch_q4_exists": (
        _sql_query(_Q4_TEXT),
        _Q4_TEXT,
        "subquery: correlated EXISTS -> decorrelated semi join",
    ),
    "tpch_q7_volume": (
        _sql_query(_Q7_TEXT),
        _Q7_TEXT,
        "bi-nation volume by year (broadcast dim pair)",
    ),
    "tpch_q8_share": (
        _sql_query(_Q8_TEXT),
        _Q8_TEXT,
        "market-share ratio: conditional sum / total sum",
    ),
    "tpch_q11_having": (
        _sql_query(_Q11_TEXT),
        _Q11_TEXT,
        "HAVING over uncorrelated scalar subquery",
    ),
    "tpch_q17_scalar": (
        _sql_query(_Q17_TEXT),
        _Q17_TEXT,
        "correlated scalar subquery -> aggregate-join decorrelation",
    ),
    "tpch_q22_anti": (
        _sql_query(_Q22_TEXT),
        _Q22_TEXT,
        "scalar threshold + NOT EXISTS anti join",
    ),
}
