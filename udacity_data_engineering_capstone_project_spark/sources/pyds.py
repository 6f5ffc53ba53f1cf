"""Custom source via the Spark 4 Python Data Source API
(pyspark.sql.datasource) — the extension point for reading systems
Spark has no built-in connector for (internal services, bespoke
formats, synthetic generators) WITHOUT a JVM plugin: the planner asks
the Python class for a schema and a partition list, then executors run
``read(partition)`` in parallel, one Arrow-batched iterator each.

The demonstration source here is a deterministic md5-hash range
generator ("hashrange"): row ``i`` in [0, n) carries
``h = int(md5('r<i>')[:14], 16)`` — exactly the repo's cross-engine
hash recipe (functions/hashing.sql_hex_to_long), so a DuckDB oracle
can recompute every value and the acceptance check covers the whole
custom-source path: schema handoff, partition planning, parallel
reads, and value fidelity.

Scale shape: partition count is an option (one executor task per
partition; each range is generated independently, no driver
materialization) — the same contract a real service-backed source
would follow, with ranges replaced by shard/offset descriptors.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _hash14(i: int) -> int:
    """First 14 hex chars of md5('r<i>') as a big-endian int — the
    Python twin of sql_hex_to_long("md5('r' || i)", 14)."""
    return int(hashlib.md5(f"r{i}".encode()).hexdigest()[:14], 16)


class HashRangeDataSource(DataSource):
    """``spark.read.format("hashrange").option("n", N)
    .option("parts", P).load()`` -> (i BIGINT, h BIGINT), i in [0, N).
    """

    @classmethod
    def name(cls) -> str:
        return "hashrange"

    def schema(self) -> str:
        return "i bigint, h bigint"

    def reader(self, schema) -> "HashRangeReader":
        return HashRangeReader(self.options)


class HashRangeReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        step = max(1, -(-self.n // self.parts))  # ceil division
        return [
            InputPartition((lo, min(lo + step, self.n)))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield (i, _hash14(i))


def register_hashrange(spark) -> None:
    """Idempotent registration of the custom source."""
    spark.dataSource.register(HashRangeDataSource)
