"""Table reconciliation: merkle-style divergence detection.

Migrations, replications, and CDC pipelines need "are these two huge
tables identical, and if not WHERE do they differ" without shipping
either table anywhere. The classic answer is bucketed content
signatures: hash every row to a digest, fold digests per bucket with an
order-independent combiner, and compare the O(n_buckets) signature
tables — only buckets that disagree need row-level investigation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import spark_hex_to_long


def bucket_signatures(
    df: DataFrame,
    key_col: str,
    digest_sql: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Per-bucket content signature of a table: (bucket, n_rows,
    xor-of-row-digests). ``digest_sql`` is a SQL string expression
    producing each row's canonical text (pick a float-free encoding —
    fixed-point ints, not raw doubles — so two engines/storages agree
    bit-for-bit).

    ``bit_xor`` is the combiner: order-independent, overflow-free at
    any row count (unlike ``sum``), one partial-agg shuffle of
    O(n_buckets) groups. Caveat of XOR folding: a difference appearing
    an EVEN number of times inside one bucket self-cancels — the row
    count catches pure insert/delete drift, and keying buckets off the
    primary key makes colliding double-edits vanishingly unlikely.
    """
    h = F.expr(spark_hex_to_long(f"md5({digest_sql})", 15))
    return (
        df.select(
            F.pmod(F.col(key_col), F.lit(n_buckets)).alias("bucket"),
            h.alias("__h"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(__h)").alias("sig"),
        )
    )


def table_diff(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    digest_sql: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Bucket-level diff of two tables: full-outer-join the bucket
    signatures and keep buckets whose (count, signature) disagree.
    Output: (bucket, n_rows_a, n_rows_b, sigs_match) — empty iff the
    tables' digested content is identical per bucket.

    Scale: each side is reduced to ``n_buckets`` rows before the join;
    the comparison itself is trivially broadcast. Nothing row-level
    ever crosses between the tables."""
    sa = bucket_signatures(a, key_col, digest_sql, n_buckets)
    sb = bucket_signatures(b, key_col, digest_sql, n_buckets)
    sa = sa.select("bucket", F.col("n_rows").alias("n_rows_a"), F.col("sig").alias("sig_a"))
    sb = sb.select("bucket", F.col("n_rows").alias("n_rows_b"), F.col("sig").alias("sig_b"))
    return (
        sa.join(sb, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("n_rows_a", F.lit(0)).alias("n_rows_a"),
            F.coalesce("n_rows_b", F.lit(0)).alias("n_rows_b"),
            (
                F.coalesce("sig_a", F.lit(0)) == F.coalesce("sig_b", F.lit(0))
            ).cast("int").alias("sigs_match"),
        )
        .filter(
            (F.col("n_rows_a") != F.col("n_rows_b")) | (F.col("sigs_match") == 0)
        )
    )
