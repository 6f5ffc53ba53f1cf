"""Change-data-capture style batch operators.

Vanilla parquet lacks MERGE INTO (Delta/Iceberg territory), but the
relational core of an upsert — new rows win over old rows on a key,
latest-wins within the new batch — is a pure DataFrame expression:
tag-union + one ranked window per key. The streaming twin
(streaming/events.upsert_latest_per_user) applies the same merge per
micro-batch with generation-swapped storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_cols: list[str],
) -> DataFrame:
    """MERGE-style upsert: every key in ``updates`` replaces its row in
    ``target``; keys only in ``target`` survive unchanged; duplicate
    keys within ``updates`` resolve latest-wins by ``order_cols``
    (descending, must make the ordering total for determinism).

    One shuffle on the key columns. At scale this is the standard
    CDC-compaction shape: the window per key holds O(versions-per-key)
    rows, and partial aggregation does not apply — if updates dwarf the
    target, pre-compact updates alone first (same function, empty
    target).
    """
    tagged = target.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col("__src").desc(), *[F.col(c).desc() for c in order_cols]
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__src", "__rn")
    )


def merge_partial_aggs(
    agg_old: DataFrame,
    agg_delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Incremental aggregate maintenance: combine two partial
    aggregate tables (same schema: keys + decomposable measures that
    merge by SUM — counts, sums, min/max need their own combinator)
    into the aggregate of the union of their inputs.

    This is the materialized-view refresh shape: keep yesterday's agg,
    aggregate only today's delta, merge — O(|delta| + |groups|)
    instead of re-scanning the full history. Physical: union + one
    hash aggregate on the keys; both inputs are already one row per
    key, so the shuffle carries group rows, not raw events.
    """
    merged = agg_old.unionByName(agg_delta)
    return merged.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )
