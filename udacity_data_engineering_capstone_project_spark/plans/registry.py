"""Unified acceptance-query registry: reference-parity + LLM-pipeline.

Consumed by ``__spark_entry__.py`` (the driver contract) and by
``bench.py``/tests. Every entry is (spark_fn, oracle_sql|None, note).
"""

from __future__ import annotations

from .queries_llm import LLM_QUERIES
from .queries_parity import PARITY_QUERIES
from .queries_sql import SQL_QUERIES

ALL_QUERIES: dict = {**PARITY_QUERIES, **SQL_QUERIES, **LLM_QUERIES}


def query_fns() -> dict:
    return {name: fn for name, (fn, _sql, _note) in ALL_QUERIES.items()}


def oracle_sqls() -> dict:
    return {
        name: sql for name, (_fn, sql, _note) in ALL_QUERIES.items() if sql is not None
    }
