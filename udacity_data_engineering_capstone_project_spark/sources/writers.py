"""Sink operators (SURVEY.md §2.1 S6-S8): partitioned parquet writes.

The reference partitions some outputs by near-unique keys (``sasdate``
-> 187 dirs is fine; ``ident`` -> 55,075 dirs is a small-files
explosion, SURVEY.md §4.3). We keep the idea — write-side partitioning
for read-time pruning — and guard against pathological keys.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame

#: Refuse-by-default threshold for distinct partition values. At 100 TB a
#: partition column with >10k values produces millions of small files.
MAX_PARTITIONS_GUARD = 10_000


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_partitions: int = MAX_PARTITIONS_GUARD,
    check_cardinality: bool = False,
) -> None:
    """S6-S8: parquet sink, optionally hash-partitioned by column(s).

    ``check_cardinality=True`` counts distinct partition keys first and
    warns (but still writes) past ``max_partitions`` — an explicit,
    opt-in version of the check the reference lacked when it partitioned
    airports by ``ident`` (55,075 dirs).
    """
    writer = df.write.mode(mode)
    if partition_by:
        if check_cardinality:
            n = df.select(*partition_by).distinct().count()
            if n > max_partitions:
                warnings.warn(
                    f"partitioning {path} by {partition_by} creates {n} "
                    f"directories (> {max_partitions}); consider a coarser key",
                    stacklevel=2,
                )
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 8,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table (saveAsTable — bucketing metadata lives
    in the catalog): pre-shuffles the data into ``n_buckets`` files by
    ``hash(bucket_by)``, optionally sorted within buckets.

    The 100 TB payoff: two tables bucketed by the same key and count
    join WITHOUT a shuffle (and with ``sort_by``, without a sort) —
    the shuffle is paid once at write time instead of on every join.
    The co-location test asserts the joined plan contains zero
    Exchange operators.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = "gzip",
) -> None:
    """JSON-lines sink (one JSON object per line, optionally gzipped
    per part-file — splittable formats beat one giant .gz at scale;
    prefer zstd where the cluster has the codec)."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
