"""Source operators (SURVEY.md §2.1 S1-S5).

S1  parquet scan                -> read_table / spark.read.parquet
S2  CSV scan (header)           -> read_csv (explicit schema preferred)
S3  CSV scan (custom delimiter) -> read_csv(sep=';')
S4  in-memory source            -> from_records (explicit schema, no
                                   ``_1``/``_2`` rename dance; reference
                                   etl.py:234,261,288,318,339)
S5  SAS label-file parser       -> parse_sas_labels (driver-side parse of a
                                   KB-sized text file; reference
                                   etl.py:42-60 ``code_mapper``)

All readers return lazy DataFrames; Catalyst pushes projections and
predicates into the parquet scan (check ``.explain``: ``PushedFilters``
/ ``ReadSchema``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Tables the driver materializes at /root/testdata/sf*/ (TESTDATA.md).
TPCH_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S1: columnar parquet scan, schema from footer metadata.

    The synthetic ``events`` table has shipped ``ts`` as both
    TIMESTAMP(NANOS) (which Spark's parquet reader rejects — read via
    ``nanosAsLong`` and truncated with ``ts div 1000``) and plain
    TIMESTAMP_NTZ micros, so the reader branches on the decoded type
    and normalizes both to session-tz (UTC) microsecond timestamps.
    The DuckDB oracles truncate identically via
    ``make_timestamp(epoch_ns(ts) // 1000)`` (a no-op for micros).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    sep: str = ",",
    header: bool = True,
) -> DataFrame:
    """S2/S3: CSV scan. Pass an explicit ``schema`` in production —
    inference costs an extra pass and strings-everywhere (the
    reference's approach, etl.py:145,370) costs a cast-per-column."""
    reader = spark.read.option("header", str(header).lower()).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def from_records(spark: SparkSession, records, schema) -> DataFrame:
    """S4: in-memory lookup dim with explicit schema.

    ``records``: list of tuples; ``schema``: StructType or DDL string
    (e.g. ``"id int, mode string"``).
    """
    return spark.createDataFrame(records, schema=schema)


def parse_sas_labels(text: str, marker: str) -> dict[str, str]:
    """S5: extract a ``value <marker> ... ;`` block of ``code = 'label'``
    pairs from a SAS labels-description file into a dict.

    Clean-room reimplementation of the reference's ``code_mapper``
    (etl.py:42-60) without its parameter-shadowing bug: operates on the
    ``text`` argument, strips quotes from both codes and labels, and
    tolerates tabs/whitespace. The file is KB-sized, so this is
    driver-side Python; feed the result to :func:`from_records`.
    """
    start = text.find(marker)
    if start == -1:
        return {}
    block = text[start:]
    block = block[: block.find(";")]
    out: dict[str, str] = {}
    for line in block.split("\n")[1:]:
        if "=" not in line:
            continue
        code, _, label = line.partition("=")
        code = code.strip().strip("'\"").strip()
        label = label.strip().strip("'\"").strip()
        if code:
            out[code] = label
    return out


def read_jsonl(spark: SparkSession, path: str, schema: str | None = None):
    """JSON-lines reader — the interchange format of LLM corpus
    pipelines. Pass an explicit ``schema`` (DDL string) in production:
    schema inference costs a FULL extra pass over the data (at 100 TB,
    a second 100 TB scan) and can widen types on dirty rows. Malformed
    lines land in ``_corrupt_record`` (PERMISSIVE mode) instead of
    failing the job."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC reader (native vectorized scan, same pushdown surface as
    parquet: predicate pushdown, column pruning, min/max stripe
    skipping). ORC parity matters for lakes that standardized on Hive:
    the engine treats it as a drop-in columnar scan."""
    return spark.read.orc(path)


def read_parquet_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution-tolerant parquet read: ``mergeSchema`` unions
    the footers of every file, so batches written before a column
    existed read as nulls next to batches written after — the
    append-only landing zone contract. Costs a footer read per file at
    planning (not a data scan); on stable-schema 100 TB reads leave it
    off and take the first footer."""
    return spark.read.option("mergeSchema", "true").parquet(path)
