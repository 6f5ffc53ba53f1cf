"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join aggregate at sf0.001.
``queries()`` exposes every implemented operator from SURVEY.md §2
plus the LLM-pipeline operators; ``oracle_sql()`` gives the DuckDB
equivalent for every one of them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from udacity_data_engineering_capstone_project_spark.plans.registry import (
    oracle_sqls,
    query_fns,
)
from udacity_data_engineering_capstone_project_spark.session import prep_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: 5-way star join (lineitem-orders-customer-
    nation-region) with revenue aggregation, at sf0.001."""
    from udacity_data_engineering_capstone_project_spark.plans.queries_parity import (
        star_join_agg,
    )

    prep_session(spark)
    return star_join_agg(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 tags are in
    each query's docstring; see plans/queries_parity.py and
    plans/queries_llm.py)."""
    fns = query_fns()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            prep_session(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        run.__name__ = fn.__name__
        return run

    return {name: wrap(fn) for name, fn in fns.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL per query. As of round 7 EVERY
    registry query has a full value-hash oracle — the last rows-only
    entry (``stream_user_totals``) was promoted via the
    drain-to-completion = batch-groupBy identity."""
    return oracle_sqls()
